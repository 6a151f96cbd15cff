"""F1 synthetic generator: pure function of (seed, row index) --
FIXTURES.md F4(d) reproducible-regeneration requirement."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sparkcodec.datagen import gen_rows


def test_rows_independent_of_batching():
    a = gen_rows(np.arange(500), seed=42)
    parts = [gen_rows(np.arange(i, min(i + 77, 500)), seed=42) for i in range(0, 500, 77)]
    b = pa.Table.from_batches(parts)
    assert pa.Table.from_batches([a]).equals(b)


def test_rows_depend_on_seed():
    a = gen_rows(np.arange(100), seed=42)
    b = gen_rows(np.arange(100), seed=43)
    assert not a.column("tokens").equals(b.column("tokens"))


def test_schema_and_ranges():
    t = gen_rows(np.arange(2000), seed=42)
    toks = t.column("tokens").flatten().to_numpy()
    assert toks.dtype == np.int32
    assert toks.min() >= 0 and toks.max() < 50257
    lens = t.column("n_tok").to_numpy()
    assert lens.min() >= 1 and lens.max() <= 8192
    assert set(t.column("source").to_pylist()) <= {"web", "books", "code", "wiki", "forums"}
    ids = t.column("doc_id").to_pylist()
    assert len(set(ids)) == 2000
    assert all(i.split("-")[-1] == f"{k:012d}" for k, i in enumerate(ids))


def test_spark_generator_matches_local(spark):
    from sparkcodec.datagen import synth_tokens

    df = synth_tokens(spark, 300, seed=42, num_partitions=7)
    got = {r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"])
           for r in df.collect()}
    local = gen_rows(np.arange(300), seed=42)
    exp = {local.column("doc_id")[i].as_py(): (
        tuple(local.column("tokens")[i].as_py()),
        local.column("n_tok")[i].as_py(),
        local.column("source")[i].as_py()) for i in range(300)}
    assert got == exp
