"""Python user-defined table functions (Spark 4 UDTF surface).

The engine's operators stay JVM-side wherever the built-ins can express
the semantics (see :mod:`..operators.textstats.chunk_documents` — array
HOFs, zero Python).  This module demonstrates the ESCAPE HATCH for
per-row one-to-many logic the built-ins cannot express: a Python UDTF
(``pyspark.sql.functions.udtf``) running Arrow-batched in the worker —
the Spark-4 generalization of the Pandas-UDF pattern to table-valued
output.

:func:`chunking_udtf` deliberately reimplements ``chunk_documents``'s
exact semantics (same tokenizer regex, same window rule) so its output
is verifiable against the SAME DuckDB oracle — demonstrating that a
UDTF-based operator plugs into the engine's correctness gate like any
built-in composition.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

from flink_kmeans_clustering_spark.functions.text import TOKEN_SPLIT_RE


def chunking_udtf(chunk_tokens: int = 128, overlap: int = 32):
    """A UDTF class chunking (doc_id, text) into sliding token windows.

    Same contract as ``operators.textstats.chunk_documents``: starts at
    ``0, stride, 2·stride, …`` while ``start < max(n − overlap, 1)``,
    ``stride = chunk_tokens − overlap``; empty docs yield nothing.

    Each worker processes Arrow batches of rows; ``eval`` yields one
    tuple per chunk.  The lateral-join plan fans rows out inside the
    partition — like the HOF form, no shuffle — but pays the
    Python/Arrow round trip, which is why the HOF form is the
    production default and this is the extension template.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    split = re.compile(TOKEN_SPLIT_RE)

    @udtf(returnType=(
        "doc_id bigint, chunk_id bigint, n_tokens bigint, chunk_text string"
    ))
    class _ChunkDocs:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF signature
            toks = [t for t in split.split((text or "").lower()) if t]
            n = len(toks)
            if n == 0:
                return
            limit = max(n - overlap, 1)
            start, cid = 0, 0
            while start < limit:
                ct = toks[start : start + chunk_tokens]
                yield (doc_id, cid, len(ct), " ".join(ct))
                start += stride
                cid += 1

    return _ChunkDocs
