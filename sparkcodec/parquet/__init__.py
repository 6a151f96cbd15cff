"""Real parquet-file emission from sparkcodec's own encoders.

The reference's end product is a parquet file (PAR1 -> row groups ->
thrift footer -> PAR1, reference: src/parquet-writer.js:48,151-175); this
subpackage reproduces that capability so pyarrow/DuckDB act as the
cross-implementation decode oracle (FIXTURES.md F4(b)), standing in for
the reference's hyparquet-reader round-trips."""

from .writer import write_parquet_bytes
