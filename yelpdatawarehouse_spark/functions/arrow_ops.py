"""mapInArrow kernels: the lowest-overhead Python escape hatch.

The repo's Python ladder, fastest to slowest, is now complete:
built-in JVM expressions (every hot path) > ``mapInArrow`` (this module:
RecordBatch in, RecordBatch out — zero pandas materialization, columnar
end-to-end via pyarrow.compute) > ``mapInPandas``/``applyInPandas``
(multimodal codecs, stateful processors: per-row Python objects but
Arrow-batched transport) > row-at-a-time UDFs (banned). ``mapInArrow``
matters when a kernel is expressible in Arrow's vectorized compute
functions: the batch never becomes pandas Series, so string-heavy
columns skip the object-per-cell conversion that dominates
mapInPandas on text workloads.

``token_count_arrow`` exists to MEASURE and PIN that contract, not to
replace the built-in: tests/test_arrow_ops.py asserts it agrees exactly
with the JVM ``size(split(...))`` expression, which remains the
production path (the built-in is still faster — it never leaves the JVM
at all)."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as S


def token_count_arrow(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) via Arrow-native whitespace tokenization:
    ``pyarrow.compute.split_pattern_regex`` + ``list_value_length``,
    entirely columnar inside the Python worker. Matches the engine's
    canonical tokenization (split on ``\\s+``, Java limit=-1 semantics:
    leading/trailing empty fields kept) so counts equal
    ``size(split(text, '\\s+'))`` bit-for-bit."""
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = S.StructType(
        [
            S.StructField("doc_id", S.LongType()),
            S.StructField("n_tokens", S.LongType()),
        ]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            toks = pc.split_pattern_regex(batch.column(text_col), r"\s+")
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(batch.column("doc_id"), pa.int64()),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                ],
                names=["doc_id", "n_tokens"],
            )

    return docs.select("doc_id", text_col).mapInArrow(kernel, schema)


def compression_ratio_arrow(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """(id, n_bytes, n_compressed, compression_ratio) per document via
    stdlib zlib inside an Arrow batch kernel — the compressibility
    quality signal pretraining filters use (Gopher/C4-style rules: text
    that compresses too WELL is repetitive boilerplate; too POORLY is
    binary junk or noise; prose sits in a mid band).

    Not SQL-oracle-expressible (no zlib in ANSI engines), so this ships
    as an operator under its own determinism/monotonicity tests instead
    of a registry entry: zlib at a fixed level is bit-deterministic for
    a given input on any platform (the DEFLATE stream is a pure function
    of input + level + strategy), so results are reproducible across
    partitionings and engines that embed the same zlib.

    Scale shape: embarrassingly parallel per-row kernel, Arrow transport,
    no pandas materialization; the per-batch Python cost is one zlib
    call per document (the compression itself dominates, as it should).
    """
    import zlib

    import pyarrow as pa

    # schema and batch column names both derive from id_col so a caller
    # passing id_col="vec_id" keeps its column name (ADVICE r7)
    out_names = [id_col, "n_bytes", "n_compressed", "compression_ratio"]
    schema = S.StructType(
        [
            S.StructField(id_col, S.LongType()),
            S.StructField("n_bytes", S.LongType()),
            S.StructField("n_compressed", S.LongType()),
            S.StructField("compression_ratio", S.DoubleType()),
        ]
    )

    def kernel(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            ids, raw_n, comp_n, ratio = [], [], [], []
            id_arr = batch.column(id_col)
            txt_arr = batch.column(text_col)
            for i in range(batch.num_rows):
                t = txt_arr[i].as_py() or ""
                b = t.encode("utf-8")
                c = zlib.compress(b, level)
                ids.append(id_arr[i].as_py())
                raw_n.append(len(b))
                comp_n.append(len(c))
                # empty docs: ratio of the fixed 8-byte zlib envelope to 1
                ratio.append(len(c) / max(len(b), 1))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(raw_n, pa.int64()),
                    pa.array(comp_n, pa.int64()),
                    pa.array(ratio, pa.float64()),
                ],
                names=out_names,
            )

    return docs.select(id_col, text_col).mapInArrow(kernel, schema)
