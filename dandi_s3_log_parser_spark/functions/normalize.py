"""Unicode text normalization — the one sanctioned Arrow/pandas path
in the functions package.

Canonicalizing text before hashing/dedup/tokenization (NFC so composed
and decomposed accents collide, casefold, whitespace collapse) is the
first stage of every web-text pipeline — without it, ``"Café"`` and
``"Café"`` dedup as different documents and the same page crawled
twice survives exact dedup.

Spark exposes NO Unicode normalization in ``pyspark.sql.functions``
(collation support in Spark 4 changes comparison, not the stored
bytes), so this is a genuine built-ins-can't-express-it case: an
Arrow-batched pandas UDF over pandas' vectorized ``.str`` kernels —
NEVER row-at-a-time Python.  Everything else (lowercase, whitespace)
deliberately rides inside the same UDF so the string crosses the
Arrow boundary once, not three times.

Whitespace is collapsed with an EXPLICIT ASCII class ``[ \\t\\n\\r\\f\\v]``
rather than ``\\s``: Python's ``\\s`` matches Unicode whitespace
(NBSP etc.) while RE2-based engines (DuckDB, Go) match ASCII only —
pinning the class keeps the operator's semantics portable and lets the
DuckDB oracle (utf8proc ``nfc_normalize`` — an INDEPENDENT
normalization implementation) hash-match exactly.

Scale: one Arrow projection, no shuffle, no state — pipelines into any
consumer; the UDF is a pure map so Spark fuses it with the enclosing
stage and AQE/partitioning are unaffected.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = "[ \t\n\r\f\v]"


def _nfc_lower_collapse_kernel(s: pd.Series) -> pd.Series:
    out = (
        s.fillna("")
        .str.lower()
        .str.replace(_WS + "+", " ", regex=True)
        .str.strip(" ")
        .str.normalize("NFC")
    )
    # preserve NULLs (fillna above is only for the .str kernels)
    return out.mask(s.isna())


def normalize_text(col: Column) -> Column:
    """``NFC(strip(collapse_ws(lower(text))))`` — see module docstring.

    Order matters only for documentation: lowercasing composed vs
    decomposed accents commutes with NFC for the case mappings involved
    here, and combining marks are never whitespace, so the pipeline is
    stable under reordering — but both engines run it in this exact
    order anyway.

    The pandas UDF is constructed per call (not at import): Spark's
    ``pandas_udf`` resolves its DDL return type against the ACTIVE
    session, so a module-level decorator would make importing this
    module require a running SparkSession.
    """
    return F.pandas_udf(_nfc_lower_collapse_kernel, "string")(col)
