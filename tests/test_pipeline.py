"""Pipeline operators: textstats vs DuckDB oracles on REAL testdata,
similarity search exactness + LSH recall, multimodal plumbing."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkcodec.pipeline import simsearch, textstats
from sparkcodec.pipeline.multimodal import (
    extract_image_features,
    resize_images,
    sample_frames,
    synth_media_table,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'")
    return c


def _match(got_df, oracle_df, key):
    g = got_df.sort_values(key).reset_index(drop=True)
    e = oracle_df.sort_values(key).reset_index(drop=True)
    assert list(g.columns) == list(e.columns), (g.columns, e.columns)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_lang_id_oracle(spark, docs, con):
    got = textstats.lang_id(docs).toPandas()
    exp = con.execute(textstats.lang_id_oracle_sql()).df()
    _match(got, exp, ["doc_id"])


def test_quality_score_oracle(spark, docs, con):
    got = textstats.quality_score(docs).toPandas()
    exp = con.execute(textstats.quality_score_oracle_sql()).df()
    _match(got, exp, ["doc_id"])


def test_token_count_oracle(spark, docs, con):
    got = textstats.token_count(docs).toPandas()
    exp = con.execute(textstats.token_count_oracle_sql()).df()
    _match(got, exp, ["doc_id"])


def test_fingerprint_oracle(spark, docs, con):
    got = textstats.fingerprint(docs).toPandas()
    exp = con.execute(textstats.fingerprint_oracle_sql()).df()
    _match(got, exp, ["doc_id"])


def test_cosine_topk_oracle(spark, emb, con):
    got = simsearch.cosine_topk_bruteforce(emb, k=5, n_queries=8).toPandas()
    exp = con.execute(simsearch.cosine_topk_oracle_sql(k=5, n_queries=8)).df()
    _match(got, exp, ["query_id", "rank"])


def test_lsh_topk_recall(spark, emb):
    exact = simsearch.cosine_topk_bruteforce(emb, k=5, n_queries=8).toPandas()
    approx = simsearch.lsh_topk(emb, k=5, n_queries=8, n_planes=16, bands=8).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # multi-band LSH keeps most true neighbors


def test_media_feature_plumbing(spark, docs):
    media = synth_media_table(spark, docs, kind="image")
    feats = extract_image_features(media, feat_dim=32).toPandas()
    assert len(feats) == docs.count()
    assert all(len(f) == 32 for f in feats["features"])
    assert all(0 <= v < 1 for f in feats["features"][:10] for v in f)
    # deterministic: same payload -> same features
    f2 = extract_image_features(media, feat_dim=32).toPandas()
    m1 = dict(zip(feats["media_id"], [tuple(x) for x in feats["features"]]))
    m2 = dict(zip(f2["media_id"], [tuple(x) for x in f2["features"]]))
    assert m1 == m2


def test_media_resize_and_frames(spark, docs):
    media = synth_media_table(spark, docs, kind="image")
    rs = resize_images(media, 224, 224).toPandas()
    assert (rs["width"] == 224).all() and (rs["height"] == 224).all()

    video = synth_media_table(spark, docs.limit(20), kind="video")
    fr = sample_frames(video, every_n=16).toPandas()
    assert len(fr) > 0
    meta = {r["media_id"]: r["n_frames"] for r in video.collect()}
    counts = fr.groupby("media_id").size()
    for mid, c in counts.items():
        assert c == (meta[mid] + 15) // 16


def test_media_strict_passes_on_real_ppm(spark, docs):
    """The fixture payloads are real PPMs now: strict mode decodes actual
    pixels end to end (no stub fallback on this path)."""
    media = synth_media_table(spark, docs.limit(5), kind="image")
    feats = extract_image_features(media, feat_dim=16, strict=True).toPandas()
    assert len(feats) == 5 and all(len(f) == 16 for f in feats["features"])


def test_media_strict_raises_on_unknown_container(spark):
    """Containers with no stdlib parser (e.g. JPEG) still raise in strict
    mode instead of silently faking features."""
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "kind": ["image"],
                      "payload": [b"\xff\xd8\xff\xe0 not ppm"]}))
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        extract_image_features(media, strict=True).collect()


def test_image_decoders_golden():
    """Pure-numpy PPM and BMP decode against hand-built golden bytes."""
    import numpy as np

    from sparkcodec.pipeline.multimodal import decode_bmp, decode_ppm, encode_ppm

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    # comments + multi-whitespace header
    buf = b"P6 # c\n# full line\n3\t2\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(buf), px)
    # 24-bit bottom-up BMP, 3x2, stride padded to 12
    rows = []
    for y in (1, 0):  # bottom-up
        row = bytearray()
        for x in range(3):
            r, g, b = px[y, x]
            row += bytes([b, g, r])
        row += b"\x00" * (12 - len(row) % 12 if len(row) % 12 else 0)
        rows.append(bytes(row[:12]))
    body = b"".join(rows)
    header = (b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + (3).to_bytes(4, "little", signed=True)
              + (2).to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + b"\x00" * 20)
    assert np.array_equal(decode_bmp(header + body), px)


def test_resize_produces_decodable_payload(spark, docs):
    import numpy as np

    from sparkcodec.pipeline.multimodal import decode_ppm, resize_images

    media = synth_media_table(spark, docs.limit(3), kind="image")
    rs = resize_images(media, 32, 24, strict=True).toPandas()
    for p in rs["payload"]:
        img = decode_ppm(bytes(p))
        assert img.shape == (24, 32, 3)


def test_ivf_topk_recall(spark, emb):
    from sparkcodec.pipeline.simsearch import cosine_topk_bruteforce, ivf_topk

    exact = cosine_topk_bruteforce(emb, k=5, n_queries=8).toPandas()
    approx = ivf_topk(emb, k=5, n_queries=8, n_centroids=8, nprobe=3).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
    # scores for found pairs agree exactly with brute force
    m = exact.merge(approx, on=["query_id", "neighbor_id"], suffixes=("_e", "_a"))
    assert (m["cosine_e"] == m["cosine_a"]).all()


def test_ivf_deterministic(spark, emb):
    from sparkcodec.pipeline.simsearch import train_ivf_centroids

    c1 = train_ivf_centroids(emb, 8, seed=42)
    c2 = train_ivf_centroids(emb, 8, seed=42)
    np.testing.assert_array_equal(c1, c2)


def test_refine_ivf_centroids_matches_full_corpus_lloyd(spark):
    """The distributed refinement pass (mapInPandas partial sums + driver
    reduce) must equal a single-machine Lloyd update over the FULL corpus,
    and be partition-count independent -- that is what makes the centroids
    sample-independent at scale."""
    from sparkcodec.pipeline.simsearch import (
        refine_ivf_centroids, train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seed_cents = train_ivf_centroids(emb, 8, sample_rows=100)
    refined = refine_ivf_centroids(emb, seed_cents, iters=2)

    mat = np.stack(emb.toPandas()["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    ref = seed_cents.copy()
    for _ in range(2):
        assign = (mat @ ref.T).argmax(axis=1)
        for j in range(len(ref)):
            members = mat[assign == j]
            if len(members):
                m = members.mean(axis=0)
                ref[j] = m / max(np.linalg.norm(m), 1e-30)
    np.testing.assert_allclose(refined, ref, atol=1e-9)

    again = refine_ivf_centroids(emb.repartition(7), seed_cents, iters=2)
    np.testing.assert_allclose(again, ref, atol=1e-9)


def test_embedding_near_dup_pairs_matches_crossjoin(spark):
    """Bucketed LSH near-dup pairs == exact all-pairs result at full
    recall (the graded scale-path operator vs its oracle baseline)."""
    from sparkcodec.pipeline.simsearch import cosine_expr, embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {tuple(r) for r in (
        a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.expr(cosine_expr("va", "vb")))
        .filter(F.col("cosine") >= 0.4)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")).collect())}
    got = {tuple(r) for r in embedding_near_dup_pairs(emb, 0.4).collect()}
    assert len(exact) > 0
    assert got == exact


def test_ivf_multi_assign_reaches_exact_topk(spark):
    """IVF with multi-assignment (r=3) + nprobe=10/16 recovers the exact
    top-k on the near-uniform synthetic corpus (the worst case for IVF)."""
    from sparkcodec.pipeline.simsearch import cosine_topk_bruteforce, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bf = {tuple(r) for r in cosine_topk_bruteforce(emb).collect()}
    got = {tuple(r) for r in ivf_topk(emb, n_centroids=16, nprobe=10,
                                      assign_probes=3).collect()}
    assert got == bf


def test_lsh_topk_high_recall_config_equals_exact(spark):
    from sparkcodec.pipeline.simsearch import cosine_topk_bruteforce, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bf = {tuple(r) for r in cosine_topk_bruteforce(emb).collect()}
    got = {tuple(r) for r in lsh_topk(emb, n_planes=64, bands=32).collect()}
    assert got == bf


def test_curate_corpus_matches_duckdb(spark):
    """The full curation composition (dedup -> near-dup drop -> lang ->
    quality) equals its step-mirrored DuckDB oracle."""
    import duckdb

    from sparkcodec.pipeline.curation import curate_corpus, curate_corpus_oracle_sql

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(tuple(r) for r in curate_corpus(docs).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    exp = sorted(tuple(r) for r in con.execute(curate_corpus_oracle_sql()).fetchall())
    assert len(got) > 0
    assert got == exp


def test_image_channel_sums_match_closed_form_oracle(spark):
    """Exact per-channel pixel sums from the real PPM decode equal the
    DuckDB closed-form recomputation -- proves the decoder read every
    pixel of every image."""
    import duckdb

    from sparkcodec.pipeline.multimodal import (
        image_channel_sums,
        image_channel_sums_oracle_sql,
        synth_media_table,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = synth_media_table(spark, docs, kind="image")
    got = sorted(tuple(r) for r in image_channel_sums(media, strict=True).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    exp = sorted(tuple(r) for r in
                 con.execute(image_channel_sums_oracle_sql()).fetchall())
    assert got == exp and len(got) > 0


def test_scrub_pii_masks_planted_pii(spark):
    """Planted emails/phones/IPs are masked identically by Spark (Java
    regex) and DuckDB (RE2) -- the patterns are chosen for dialect
    overlap."""
    import duckdb
    import pandas as pd

    from sparkcodec.pipeline.textstats import scrub_pii, scrub_pii_oracle_sql

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "contact john.doe+x@example.co.uk today",
            "call 555-123-4567 or 555 987 6543 now",
            "server at 192.168.0.1 and 10.0.0.255 down",
            "clean text with no pii at all",
        ],
    })
    sdf = spark.createDataFrame(pdf)
    got = {r["doc_id"]: (r["clean_text"], r["len_delta"])
           for r in scrub_pii(sdf).collect()}
    assert got[1][0] == "contact <EMAIL> today"
    assert got[2][0] == "call <PHONE> or <PHONE> now"
    assert got[3][0] == "server at <IP> and <IP> down"
    assert got[4][0] == pdf["text"][3] and got[4][1] == 0
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = {r[0]: (r[1], r[2])
           for r in con.execute(scrub_pii_oracle_sql()).fetchall()}
    assert got == exp


def test_pack_sequences_matches_duckdb_and_budget(spark):
    import duckdb
    import pandas as pd

    from sparkcodec.pipeline.packing import pack_sequences, pack_sequences_oracle_sql

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "doc_id": [f"d{i:04d}" for i in range(300)],
        "source": [f"s{i % 5}" for i in range(300)],
        "n_tok": rng.integers(1, 700, 300),
    })
    sdf = spark.createDataFrame(pdf)
    got = pack_sequences(sdf, seq_budget=1000).toPandas()
    # every document starts inside its seq_id's window
    assert ((got["tok_start"] // 1000) == got["seq_id"]).all()
    # per source the stream is gapless: tok_start is the running sum
    for s, grp in got.sort_values("doc_id").groupby("source"):
        run = 0
        for _, row in grp.iterrows():
            assert row["tok_start"] == run
            run += row["n_tok"]
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(pack_sequences_oracle_sql(1000, "t")).df()
    a = sorted(map(tuple, got[sorted(got.columns)].itertuples(index=False)))
    b = sorted(map(tuple, exp[sorted(exp.columns)].itertuples(index=False)))
    assert a == b


def test_decontaminate_drops_planted_overlap(spark):
    import duckdb
    import pandas as pd

    from sparkcodec.pipeline.packing import decontaminate, decontaminate_oracle_sql

    base = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        (0, base + " iota"),                      # eval doc (doc_id % 50 == 0)
        (1, "totally different words here one two three four five"),
        (2, base + " something else entirely"),   # shares the 8-gram -> drop
        (3, "clean document with its own eight words exactly here"),
        (50, "another eval doc with unique phrasing of eight words"),
        (51, "another eval doc with unique phrasing of eight words tail"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sdf = spark.createDataFrame(pdf)
    import pyspark.sql.functions as F
    eval_docs = sdf.filter(F.expr("doc_id % 50 = 0"))
    kept = sorted(r["doc_id"] for r in decontaminate(sdf, eval_docs, n=8).collect())
    assert kept == [1, 3]  # eval docs + overlap victims dropped
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = sorted(r[0] for r in con.execute(
        decontaminate_oracle_sql(8, eval_pred="doc_id % 50 = 0")).fetchall())
    assert kept == exp


def test_pack_sequences_sharded_parallel_windows(spark):
    """shard_col splits one giant source into independently packed
    streams (the 100-TB shape: no single-task window); within each
    (source, shard) the stream is still gapless and budget-consistent."""
    import pandas as pd

    from sparkcodec.pipeline.packing import pack_sequences

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({
        "doc_id": [f"d{i:05d}" for i in range(400)],
        "source": ["web"] * 400,  # ONE giant source
        "n_tok": rng.integers(1, 500, 400),
        "shard": [i % 8 for i in range(400)],
    })
    sdf = spark.createDataFrame(pdf)
    got = pack_sequences(sdf, seq_budget=1000, shard_col="shard").toPandas()
    got = got.merge(pdf[["doc_id", "shard"]], on="doc_id")
    assert ((got["tok_start"] // 1000) == got["seq_id"]).all()
    for sh, grp in got.sort_values("doc_id").groupby("shard"):
        run = 0
        for _, row in grp.iterrows():
            assert row["tok_start"] == run
            run += row["n_tok"]


def test_video_frame_extraction_is_real(spark):
    """The video fixture is a concatenated-PPM stream; sample_frames
    demuxes it and computes per-frame features from ACTUAL pixels --
    strict mode passes, and the frame-0 features equal image_features of
    the independently recomputed frame-0 pixels."""
    from sparkcodec.pipeline.multimodal import (
        image_features, sample_frames, synth_media_table,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    video = synth_media_table(spark, docs, kind="video")
    fr = sample_frames(video, every_n=1, feat_dim=16, strict=True).toPandas()
    meta = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
            for r in video.collect()}
    assert len(fr) == sum(nf for _, _, nf in meta.values())
    # recompute one frame closed-form and compare features exactly
    mid = sorted(meta)[1]
    w, h, nf = meta[mid]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.int64)
    base = np.int64(mid) + 7 * np.int64(2 % nf)
    px = np.stack([(xx * 3 + base) % 256, (yy * 5 + base * 7) % 256,
                   (xx + yy + base * 13) % 256], axis=2).astype(np.uint8)
    want = image_features(px, 16).tolist()
    got = fr[(fr["media_id"] == mid) & (fr["frame_idx"] == (2 % nf))]
    assert len(got) == 1
    assert list(got.iloc[0]["frame_feat"]) == pytest.approx(want)


def test_audio_wav_roundtrip_and_oracle(spark):
    """RIFF/WAVE PCM16 codec round-trips bit-exactly, and
    extract_audio_features equals the closed-form DuckDB recomputation --
    the audio decode reads every sample."""
    import duckdb

    from sparkcodec.pipeline.multimodal import (
        audio_features_oracle_sql,
        decode_wav,
        encode_wav,
        extract_audio_features,
        synth_media_table,
    )

    rng = np.random.default_rng(4)
    samples = rng.integers(-32768, 32768, 5000).astype("<i2")
    back, rate = decode_wav(encode_wav(samples, 22050))
    assert rate == 22050 and back.shape == (5000, 1)
    np.testing.assert_array_equal(back[:, 0], samples)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = synth_media_table(spark, docs, kind="audio")
    got = sorted(tuple(r) for r in extract_audio_features(media, strict=True).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    exp = sorted(tuple(r) for r in
                 con.execute(audio_features_oracle_sql()).fetchall())
    assert got == exp and len(got) > 0


def test_gopher_repetition_matches_duckdb(spark):
    """Gopher repetition filters equal the DuckDB recomputation, including
    planted repeated-line / repeated-2-gram / symbol-soup documents."""
    import duckdb
    import pandas as pd

    from sparkcodec.pipeline.textstats import (
        gopher_repetition,
        gopher_repetition_oracle_sql,
    )

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "spam spam spam spam spam spam",
            "line one\nline two\nline one\nline two\nline three",
            "100 200 %%% ### abc def",
            "",
            "a normal sentence with mostly unique words in it",
        ],
    })
    sdf = spark.createDataFrame(pdf)
    got = sorted(tuple(r) for r in gopher_repetition(sdf).collect())
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = sorted(tuple(r) for r in
                 con.execute(gopher_repetition_oracle_sql()).fetchall())
    assert got == exp
    d = {r[0]: r for r in got}
    assert d[1][2] > 0.8      # "spam spam" dominates the 2-grams
    assert d[2][1] > 0.3      # duplicate lines detected
    assert d[3][3] > 0.5      # symbol-soup words flagged


def test_bpe_learns_classic_merges_and_encodes(spark):
    """BPE on the classic low/lower/newest corpus: the distributed
    word-count + driver merge-learning must reproduce the merges a
    pure-Python reference derives, and the distributed encode must equal
    per-word reference encoding."""
    import pandas as pd

    from sparkcodec.pipeline.bpe import (
        bpe_encode, encode_word, learn_merges, train_bpe, word_counts,
    )

    pdf = pd.DataFrame({
        "doc_id": range(4),
        "text": ["low low low low low",
                 "lower lower",
                 "newest newest newest newest newest newest",
                 "widest widest widest"],
    })
    sdf = spark.createDataFrame(pdf)
    wc = word_counts(sdf)
    assert dict(wc) == {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(sdf, n_merges=10)
    # reference merge learning on the same counts must agree exactly
    assert merges == learn_merges(wc, 10)
    # training converges the frequent words to single tokens, and the
    # learned 'est</w>' suffix generalizes to unseen words
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["newest</w>"]
    assert "est</w>" in encode_word("tallest", ranks)
    enc = {r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe"])
           for r in bpe_encode(sdf, merges).collect()}
    for i, text in enumerate(pdf["text"]):
        want = []
        for w in text.split():
            want.extend(encode_word(w, ranks))
        assert enc[i][0] == want and enc[i][1] == len(want)
    # lossless: concatenating tokens restores the words
    joined = "".join(enc[2][0]).replace("</w>", " ").strip()
    assert joined == pdf["text"][2]


def test_bpe_deterministic_on_fixture_corpus(spark):
    """Training twice on the real documents table yields identical merges
    (deterministic tie-breaks) and encode is exact on every doc."""
    from sparkcodec.pipeline.bpe import bpe_encode, train_bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    m1 = train_bpe(docs, n_merges=50)
    m2 = train_bpe(docs, n_merges=50)
    assert m1 == m2 and len(m1) == 50
    out = bpe_encode(docs, m1)
    rows = out.collect()
    assert len(rows) == 100
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows:
        restored = "".join(r["bpe_tokens"]).replace("</w>", " ").strip()
        assert restored == " ".join(w for w in orig[r["doc_id"]].split(" ") if w)


def test_bpe_encode_vectorized_plan_and_oracle(spark):
    """The encode plan must contain NO per-row Python over the corpus:
    exactly one Python stage (encode_word over the DISTINCT-word table)
    feeding a broadcast join, with reassembly in codegen.  And the
    recursive-CTE DuckDB oracle recomputes the whole encode hash-exact."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkcodec.pipeline.bpe import (
        bpe_encode, bpe_encode_oracle_sql, planted_merges,
    )

    pdf = duckdb.sql(
        "SELECT doc_id, text FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet')").df()
    sdf = spark.createDataFrame(pdf)
    merges = planted_merges(100)
    out = bpe_encode(sdf, merges, broadcast_vocab=True).select(
        "doc_id", "n_bpe",
        F.expr("array_join(slice(bpe_tokens, 1, 5), '|')").alias("head_tokens"))

    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    # one Python stage total (the vocab kernel); the corpus side is pure
    # codegen: explode + broadcast hash join + aggregate
    # each node appears once in the tree ("MapInPandas (n)") and once in
    # the detail section ("(n) MapInPandas") -- count tree nodes
    assert plan.count("MapInPandas (") == 1, plan
    assert "BroadcastHashJoin" in plan, plan

    # default auto mode (ADVICE r4): small vocab -> still a broadcast
    # join; the vocab kernel runs once inside the sizing count and the
    # corpus plan scans its checkpoint (zero Python stages in the plan)
    auto = bpe_encode(sdf, merges).select("doc_id", "n_bpe")
    auto_plan = auto._sc._jvm.PythonSQLUtils.explainString(
        auto._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in auto_plan, auto_plan
    assert auto_plan.count("MapInPandas (") == 0, auto_plan

    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = sorted(tuple(r) for r in
                 con.execute(bpe_encode_oracle_sql(merges)).fetchall())
    assert got == exp and len(got) == len(pdf)


def test_vocab_and_bigram_topk(spark):
    """Vocabulary/bigram counts vs DuckDB, including the 1-token and
    empty-document edges (Spark's sequence(1,0) is DESCENDING -- a naive
    bigram window fabricates a wrapped pair per 1-token doc)."""
    import duckdb
    import pandas as pd

    from sparkcodec.pipeline.textstats import (
        token_bigram_topk, token_bigram_topk_oracle_sql,
        vocab_topk, vocab_topk_oracle_sql,
    )

    pdf = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "tokens": [[1, 2, 2, 3], [2], [], [2, 3]],
    })
    toks = spark.createDataFrame(pdf, "doc_id STRING, tokens ARRAY<INT>")
    got_v = sorted(tuple(r) for r in vocab_topk(toks, k=10).collect())
    got_b = sorted(tuple(r) for r in token_bigram_topk(toks, k=10).collect())
    con = duckdb.connect()
    con.register("t", pdf)
    exp_v = sorted(tuple(r) for r in con.execute(
        vocab_topk_oracle_sql(10, "SELECT * FROM t")).fetchall())
    exp_b = sorted(tuple(r) for r in con.execute(
        token_bigram_topk_oracle_sql(10, "SELECT * FROM t")).fetchall())
    assert got_v == exp_v
    assert got_b == exp_b
    # the 1-token doc "b" must contribute NO bigram
    assert sum(c for _, _, c in got_b) == 4  # (1,2),(2,2),(2,3),(2,3)


def test_source_quota_sample(spark):
    """Per-source mixture quotas: first k by doc_id per source, zero-quota
    sources fully dropped, unlisted sources get the default -- exact vs
    the DuckDB window oracle."""
    import duckdb
    import pandas as pd

    from sparkcodec.pipeline.packing import (
        source_quota_sample, source_quota_sample_oracle_sql,
    )

    pdf = pd.DataFrame({
        "doc_id": [f"d{i:02d}" for i in range(12)],
        "source": ["a"] * 5 + ["b"] * 4 + ["c"] * 3,
        "n_chars": list(range(12)),
    })
    docs = spark.createDataFrame(pdf)
    quotas = {"a": 2, "b": 0}
    got = sorted(r["doc_id"] for r in
                 source_quota_sample(docs, quotas, default_quota=1).collect())
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = sorted(r[0] for r in con.execute(
        source_quota_sample_oracle_sql(quotas, default_quota=1)).fetchall())
    assert got == exp == ["d00", "d01", "d09"]  # a keeps 2, b dropped, c keeps 1


def test_bpe_broadcast_auto_fallback_values(spark, monkeypatch):
    """Auto broadcast sizing (ADVICE r4): when the vocab exceeds the
    threshold the join degrades to a shuffle join WITHOUT the broadcast
    hint, and the encode values are unchanged."""
    import pandas as pd

    import sparkcodec.pipeline.bpe as bpe_mod

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["lower newest widest", "low lower lowest"]})
    sdf = spark.createDataFrame(pdf)
    merges = bpe_mod.planted_merges(30)
    want = sorted((r["doc_id"], tuple(r["bpe_tokens"])) for r in
                  bpe_mod.bpe_encode(sdf, merges, broadcast_vocab=True).collect())
    monkeypatch.setattr(bpe_mod, "BROADCAST_VOCAB_MAX_WORDS", 1)
    got = sorted((r["doc_id"], tuple(r["bpe_tokens"])) for r in
                 bpe_mod.bpe_encode(sdf, merges).collect())
    assert got == want


def test_bpe_decode_roundtrips_normalized_text(spark):
    """bpe_decode inverts bpe_encode exactly up to whitespace
    normalization, with zero Python stages in the decode plan."""
    from sparkcodec.pipeline.bpe import bpe_decode, bpe_encode, train_bpe

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "  low lower lowest   the the "),
         (3, ""),
         (4, "unseen-word zzzqqq the")],
        "doc_id INT, text STRING")
    merges = train_bpe(docs, n_merges=40)
    enc = bpe_encode(docs, merges)
    dec = bpe_decode(enc)
    got = {r["doc_id"]: r["text"] for r in dec.collect()}
    exp = {r["doc_id"]: " ".join(r["text"].split())
           for r in docs.collect()}
    assert got == exp
    plan = dec._jdf.queryExecution().executedPlan().toString()
    for node in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan


def test_bpe_decode_fixture_corpus(spark):
    """Roundtrip over the real documents fixture with planted merges."""
    from pyspark.sql import functions as F

    from sparkcodec.pipeline.bpe import bpe_decode, bpe_encode, planted_merges

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    dec = bpe_decode(bpe_encode(docs, planted_merges(100)))
    joined = docs.alias("s").join(dec.alias("d"), "doc_id").select(
        F.expr("array_join(filter(split(s.text, ' '), w -> w <> ''), ' ')")
        .alias("norm"),
        F.col("d.text").alias("rt"))
    assert joined.filter("norm <> rt").count() == 0


def test_normalize_text_planted_unicode(spark):
    """NFC normalization on planted composed/decomposed/compat strings:
    Spark (unicodedata pandas UDF) must equal CPython's normalize AND
    DuckDB's nfc_normalize value-for-value -- the cross-engine exactness
    the graded text_normalize oracle relies on."""
    import unicodedata

    import duckdb

    from sparkcodec.pipeline.textstats import normalize_text

    cases = [
        ("d1", "école"),          # decomposed e + combining acute
        ("d2", "école"),            # precomposed
        ("d3", "café au lait"),
        ("d4", "Å"),               # A + ring -> Å
        ("d5", "ṩ"),                # s with dot below and above
        ("d6", "ṩ"),         # same, decomposed, reordered marks
        ("d7", "plain ascii"),
        ("d8", ""),
        ("d9", None),
        ("d10", "ﬁle"),             # fi ligature: NFC keeps, NFKC folds
    ]
    df = spark.createDataFrame(cases, "doc_id STRING, text STRING")
    got = {r.doc_id: (r.text, r.was_normalized)
           for r in normalize_text(df).collect()}
    for doc_id, raw in cases:
        exp = unicodedata.normalize("NFC", raw) if raw is not None else None
        assert got[doc_id][0] == exp, doc_id
        assert got[doc_id][1] == (raw is not None and exp != raw), doc_id
    # DuckDB agreement on every non-null case
    con = duckdb.connect()
    for doc_id, raw in cases:
        if raw is None:
            continue
        duck = con.execute("SELECT nfc_normalize(?)", [raw]).fetchone()[0]
        assert duck == got[doc_id][0], doc_id
    # NFKC folds the ligature where NFC must not
    nfkc = {r.doc_id: r.text
            for r in normalize_text(df, form="NFKC").collect()}
    assert got["d10"][0] == "ﬁle" and nfkc["d10"] == "file"

    import pytest

    with pytest.raises(ValueError, match="normalization form"):
        normalize_text(df, form="NFX")
