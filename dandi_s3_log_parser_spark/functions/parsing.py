"""S3-access-log line parsing: vectorized fast path + repair fallback.

Behavior-parity notes (no code copied; semantics re-derived from the
reference's observable behavior and goldens):

* Tokenizer regex + 3-group coalesce: reference
  ``src/dandi_s3_log_parser/_s3_log_line_parser.py:9-29``.
* Quote-scrub repair for lines whose regex parse yields >26 tokens
  (unescaped quotes in user_agent / request_uri): reference
  ``_s3_log_line_parser.py:32-74``.  The repair splices the text
  *between* quoted blocks with ``" - "`` separators and drops the block
  between the last two quote pairs — we reproduce that quirk exactly
  (verified against ``tests/test_reduction/examples/reduction_example_2``).
* Pad 24/25-token parses to 26 with ``"-"``; any other count is a parse
  error: reference ``_s3_log_line_parser.py:77-97``.
* Fast positional path: split by single space; ip=token[4], operation=
  token[7], object_key=token[8]; status/bytes from the block between the
  first two ``'" '`` occurrences (7 tokens expected): reference
  ``_s3_log_file_reducer.py:158-222``.

Execution model: the fast field extraction is done with **native Column
expressions** (JVM codegen, zero Python) in ``operators/reduce.py``; this
module supplies the **vectorized pandas UDF** that resolves
``http_status_code`` / ``bytes_sent`` including the minority repair path
(pandas ``.str`` vectorized ops for the batch; per-row Python only for
rows that genuinely need the regex repair parse).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import (
    KNOWN_OPERATIONS_SET,
    S3_LOG_TOKEN_REGEX,
    STATUS_ERROR_PARSE,
    STATUS_ERROR_STATUS,
    STATUS_ERROR_UNKNOWN_OP,
    STATUS_OK,
    STATUS_OK_REPAIRED,
)

# ---------------------------------------------------------------------------
# Pure-Python parity functions (repair path + test oracle)
# ---------------------------------------------------------------------------


def tokenize_log_line(line: str) -> list[str]:
    """Tokenize one raw log line into quoted/bracketed/bare tokens."""
    return [a or b or c for a, b, c in S3_LOG_TOKEN_REGEX.findall(line)]


def _substring_indices(string: str, substring: str) -> list[int]:
    indices: list[int] = []
    start = 0
    while True:
        nxt = string.find(substring, start)
        if nxt == -1:
            return indices
        indices.append(nxt)
        start = nxt + 1


def scrub_unescaped_quotes(line: str) -> str | None:
    """Strip unescaped-quote blocks so the tokenizer yields <=26 tokens.

    Returns ``None`` when the structure is too damaged to repair (the
    reference then error-collects and drops the line).
    """
    starts = _substring_indices(line, ' "')
    ends = _substring_indices(line, '" ')
    if len(starts) == 0 or len(starts) != len(ends):
        return None
    cleaned = line[: starts[0]]
    for i in range(1, len(starts) - 1):
        cleaned += " - " + line[ends[i - 1] + 2 : starts[i]]
    cleaned += " - " + line[ends[-1] + 2 :]
    return cleaned


def parse_line_to_fields(line: str) -> list[str] | None:
    """Full (slow-path) parse of one line to the 26-field positional schema.

    Returns ``None`` on unrepairable / mis-sized parses (error semantics).
    """
    tokens = tokenize_log_line(line)
    if len(tokens) > 26:
        cleaned = scrub_unescaped_quotes(line)
        if cleaned is None:
            return None
        tokens = tokenize_log_line(cleaned)
    if len(tokens) == 24:
        tokens = tokens + ["-", "-"]
    elif len(tokens) == 25:
        tokens = tokens + ["-"]
    if len(tokens) != 26:
        return None
    return tokens


def slow_parse_status_bytes(line: str) -> tuple[str, str, str]:
    """Slow-path resolution of (http_status_code, bytes_sent_raw, parse_status).

    Mirrors the basic reduction path's validation ordering
    (reference ``_s3_log_file_reducer.py:225-293``): parse errors and
    mis-sized token counts -> error_parse; non-digit status ->
    error_status; unknown operation -> error_unknown_operation; non-digit
    non-``"-"`` bytes would raise in the reference's int() cast ->
    error_parse.  Keep/drop decisions on well-formed rows (2xx, operation
    equality, excluded ip) are applied natively downstream.
    """
    fields = parse_line_to_fields(line)
    if fields is None:
        return ("", "", STATUS_ERROR_PARSE)
    # positional schema: operation=6, http_status_code=9, bytes_sent=11
    operation, status_code, bytes_raw = fields[6], fields[9], fields[11]
    if not status_code.isdigit():
        return (status_code, bytes_raw, STATUS_ERROR_STATUS)
    if operation not in KNOWN_OPERATIONS_SET:
        return (status_code, bytes_raw, STATUS_ERROR_UNKNOWN_OP)
    if bytes_raw != "-" and not bytes_raw.isdigit():
        return (status_code, bytes_raw, STATUS_ERROR_PARSE)
    return (status_code, bytes_raw, STATUS_OK_REPAIRED)


# ---------------------------------------------------------------------------
# Vectorized batch resolution (pandas inside the Arrow UDF)
# ---------------------------------------------------------------------------


def resolve_status_bytes_batch(lines: pd.Series) -> pd.DataFrame:
    """Vectorized (http_status_code, bytes_sent_raw, parse_status) per line.

    Fast path (whole batch, pandas .str ops): block between the first two
    ``'" '`` occurrences must have exactly 7 space-split tokens with a
    digit status and digit-or-``"-"`` bytes (reference fast-path checks,
    ``_s3_log_file_reducer.py:192-197``; ``"-"`` is accepted directly here
    because the reference's detour through the slow path for ``"-"`` bytes
    produces the identical kept row with bytes 0).  Rows failing the fast
    checks take the per-row regex repair parse.
    """
    # null/empty rows are the caller's native-fast-path rows (the UDF
    # input column is NULLed for them so they skip Arrow payload); mark
    # them error_parse cheaply — the caller discards the UDF result for
    # those rows anyway
    lines = lines.fillna("").astype(str)
    segs = lines.str.split('" ')
    seg1 = segs.str.get(1).fillna("").astype(str)
    blk = seg1.str.split(" ")
    blk_len = blk.str.len()
    status = blk.str.get(0).fillna("").astype(str)
    bytes_raw = blk.str.get(2).fillna("").astype(str)

    status_digit = status.str.fullmatch(r"[0-9]+", na=False)
    bytes_ok = bytes_raw.str.fullmatch(r"[0-9]+", na=False) | (bytes_raw == "-")
    fast_ok = (blk_len == 7) & status_digit & bytes_ok

    out = pd.DataFrame(
        {
            "http_status_code": status.where(fast_ok, ""),
            "bytes_sent_raw": bytes_raw.where(fast_ok, ""),
            "parse_status": pd.Series(STATUS_OK, index=lines.index).where(
                fast_ok, ""
            ),
        }
    )
    empty = lines == ""
    out.loc[empty, "parse_status"] = STATUS_ERROR_PARSE
    slow_idx = out.index[~fast_ok & ~empty]
    if len(slow_idx):
        slow = [slow_parse_status_bytes(lines[i]) for i in slow_idx]
        out.loc[slow_idx, ["http_status_code", "bytes_sent_raw", "parse_status"]] = slow
    return out


RESOLVE_STRUCT = T.StructType(
    [
        T.StructField("http_status_code", T.StringType()),
        T.StructField("bytes_sent_raw", T.StringType()),
        T.StructField("parse_status", T.StringType()),
    ]
)


@F.pandas_udf(RESOLVE_STRUCT)
def resolve_status_bytes_udf(lines: pd.Series) -> pd.DataFrame:
    """Arrow-batched struct UDF wrapping :func:`resolve_status_bytes_batch`."""
    return resolve_status_bytes_batch(lines)
