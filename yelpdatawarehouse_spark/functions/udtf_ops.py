"""Python UDTFs (Spark 4 user-defined table functions), Arrow-batched.

The repo's rule is built-ins first: ``text_chunk_sliding``
(queries/llmops.py) already does sliding-window chunking as a pure
sequence/explode/slice flatMap, entirely inside whole-stage codegen, and
stays the production path. This module exists because a complete engine
also needs the ESCAPE HATCH for table-valued transforms the built-ins
cannot express (chunk-by-sentence with a real tokenizer, decode-and-expand
of a binary payload into N typed rows, model-scored span extraction): the
Spark-4 UDTF surface — a Python class with ``eval`` yielding rows, invoked
per input row via ``LATERAL``, batched over Arrow (``useArrow=True``), and
registered like any SQL table function.

``ChunkTokens`` deliberately reimplements ``text_chunk_sliding``'s exact
semantics so the draft query ``text_chunk_udtf`` can be verified against
the SAME DuckDB oracle that already gates the built-in — the hash match
proves the UDTF plumbing (row fan-out, Arrow batch transfer, column
typing) end-to-end against an independently-computed truth, not against
itself.

Scale notes (the 100 TB lens):

* A UDTF is a per-partition Python subprocess pipe — like every Python
  path it forfeits codegen, so it belongs on transforms that NEED Python,
  never on ones expressible with built-ins (the twin exists to measure
  exactly that gap, not to replace the built-in).
* It IS embarrassingly parallel: no shuffle is introduced, parallelism is
  inherited from input partitioning, and Arrow batching amortises the
  pipe crossing, so throughput scales linearly with executors.
* State lives per-partition inside the class instance (``__init__`` runs
  once per partition), so heavyweight setup (loading a tokenizer) is
  amortised across the partition's rows — the same pattern as
  mapInPandas kernels in multimodal/columns.py.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

# Mirror queries/llmops.py text_chunk_sliding exactly: 16-token chunks
# every 12 tokens (4-token overlap), whitespace tokenization.
CHUNK, STRIDE = 16, 12

_WS = re.compile(r"\s+")


@udtf(
    returnType="chunk_idx: bigint, n_tokens: bigint, chunk_hash: string",
    useArrow=True,
)
class ChunkTokens:
    """Sliding-window token chunker: one input row -> one row per chunk.

    Tokenization is ``re.split(r'\\s+', text)`` — Python's split keeps
    leading/trailing empty fields exactly like Spark's ``split(text,
    '\\s+')`` (Java limit=-1) and DuckDB's ``string_split_regex``, so all
    three engines see identical token arrays and the md5 chunk hashes are
    comparable across them.
    """

    def eval(self, text: str):
        if text is None:
            return
        toks = _WS.split(text)
        n = len(toks)
        # sequence(0, greatest(n-1, 0), STRIDE): starts <= n-1, always >= one.
        for start in range(0, max(n - 1, 0) + 1, STRIDE):
            chunk = toks[start : start + CHUNK]
            yield (
                start // STRIDE,
                len(chunk),
                hashlib.md5(" ".join(chunk).encode("utf-8")).hexdigest(),
            )


def text_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF twin of ``text_chunk_sliding`` — identical output contract
    (doc_id, chunk_idx, n_tokens, chunk_hash), computed through the
    Python-UDTF lateral-join surface instead of sequence/explode/slice.

    Plan shape: scan -> BatchEvalPythonUDTF (Arrow) -> project. No
    shuffle, no collect; the lateral join against a UDTF is a generate
    node, so input partitioning (and therefore cluster parallelism)
    passes straight through.
    """
    from ..sources.tables import table

    spark.udtf.register("ydw_chunk_tokens", ChunkTokens)
    d = table(spark, sf_dir, "documents")
    d.select(F.col("doc_id").cast("long").alias("doc_id"), "text").createOrReplaceTempView(
        "_ydw_chunk_in"
    )
    return spark.sql(
        """
        SELECT i.doc_id, c.chunk_idx, c.n_tokens, c.chunk_hash
        FROM _ydw_chunk_in i, LATERAL ydw_chunk_tokens(i.text) c
        """
    )


# Same oracle as text_chunk_sliding (queries/llmops.py) — the gate that
# already has a driver-green history for these semantics.
CHUNK_UDTF_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks
           FROM documents),
s AS (SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks), 1), {STRIDE})) AS start
      FROM t)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(start // {STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, start + 1, start + {CHUNK})) AS BIGINT)
           AS n_tokens,
       md5(array_to_string(list_slice(toks, start + 1, start + {CHUNK}), ' '))
           AS chunk_hash
FROM s
"""

UDTF_DRAFTS = {
    "text_chunk_udtf": (text_chunk_udtf, CHUNK_UDTF_ORACLE),
}
