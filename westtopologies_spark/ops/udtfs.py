"""Python UDTF surface (§2.11): the table-function analog of the
reference's bolt extension model (a bolt's ``execute`` may emit any
number of tuples per input — ``DiscussionTreeBolt.java:87-175`` — which
is exactly a UDTF's contract, one input row -> n output rows).

The built-in expression path (``scale.trainprep.chunk_documents``)
stays the hot path — JVM-side, zero Python; this UDTF variant exists
to demonstrate the extension surface and is pinned to the expression
path by a parity test.  UDTF rows cross the JVM->Python boundary
row-at-a-time per input, so at 100 TB a UDTF belongs only where
per-row imperative logic genuinely can't be expressed as
generate/transform expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk_text string, chunk_len int")
class ChunkTextUDTF:
    """One row per fixed-size character chunk with overlap — the UDTF
    twin of ``chunk_documents`` (chunk k covers 1-indexed positions
    [1 + k*stride, 1 + k*stride + size); empty text yields one empty
    chunk and NULL text yields one NULL chunk — substring(NULL) is
    NULL — matching the expression path; ADVICE r1)."""

    def eval(self, text: str, size: int, stride: int):
        if text is None:
            yield 0, None, None
            return
        n = max(len(text), 1)
        k = 0
        for start in range(0, n, stride):
            piece = text[start : start + size]
            yield k, piece, len(piece)
            k += 1


def chunk_documents_udtf(
    spark: SparkSession, docs: DataFrame, size: int, stride: int
) -> DataFrame:
    """LATERAL-join the chunking UDTF against ``docs`` — returns the
    same schema as ``chunk_documents``."""
    spark.udtf.register("chunk_text_udtf", ChunkTextUDTF)
    docs.createOrReplaceTempView("_udtf_docs_in")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.chunk_text, c.chunk_len "
        "FROM _udtf_docs_in d, "
        f"LATERAL chunk_text_udtf(d.text, {int(size)}, {int(stride)}) c"
    )
