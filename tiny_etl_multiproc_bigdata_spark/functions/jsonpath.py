"""The JSON-path INPUT CONTRACT for ``events.props`` (r13 adversarial-
JSON parity matrix — tools/null_parity_audit.py ``--jsonedge``).

Why the class exists: a JSON column in a real log pipeline carries
truncated writes, unquoted keys, leading-zero numbers, free text,
duplicate keys, and overflow literals — all schema-legal VARCHAR. The
engines disagree on every one of them:

* Spark's ``get_json_object`` (Jackson) is LENIENT — malformed JSON
  extracts as NULL — but the downstream ANSI ``CAST(... AS BIGINT)``
  throws NumberFormatException the moment an extracted token isn't a
  clean integer (``{"k": 1e999}`` extracts as the string
  ``"Infinity"``, quotes included) — one bad row takes down the whole
  query;
* DuckDB's ``json_extract_string`` (yyjson) is STRICT — malformed
  JSON raises InvalidInputException outright, so the same row crashes
  the oracle instead (and renders the overflow literal as bare
  ``Infinity``, a different string than Spark's).

The symmetric contract: a usable ``$.k`` is a row whose props parses
and whose extracted token is an INTEGER literal (optionally quoted /
space-padded); every other shape is NULL on BOTH engines — lenient
extraction + TRY semantics end to end, never an exception. Engine
side: ``get_json_object(...).try_cast('bigint')`` (Jackson already
NULLs malformed input; try_cast NULLs the non-integer extractions
ANSI CAST would throw on). Oracle side: ``json_valid`` gates the
strict parser, and an integer-token regexp gates TRY_CAST — because
DuckDB's TRY_CAST is NOT the mirror of Spark's: ``TRY_CAST('2.5' AS
BIGINT)`` ROUNDS to 3 in DuckDB where Spark's try_cast yields NULL —
an ungated float-valued ``$.k`` silently biases the oracle by ±1
rather than crashing (verified empirically, r13). The trim mirrors
Spark's cast-side whitespace trimming (``" 1 "`` → 1 on both). Both
engines take FIRST-key-wins on duplicate keys (verified
empirically), so the lenient paths agree row-for-row on every
adversarial shape in the spike matrix.

The VARIANT path (plans/sql_surface.py::variant_shred_props) needs one
extra clause: Spark's ``parse_json`` REJECTS duplicate keys (NULL via
``try_parse_json``) where both lenient parsers take the first value —
and DuckDB cannot detect post-parse duplicates at all — so that entry
COALESCEs the variant extraction with the lenient Jackson fallback,
making first-wins the declared semantic there too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_bigint(col: str, path: str) -> Column:
    """Engine-side contract extraction: lenient parse + TRY cast."""
    return F.get_json_object(col, path).try_cast("bigint")


def duck_json_string(col: str, path: str) -> str:
    """DuckDB twin of Spark's lenient get_json_object string
    extraction: the ``json_valid`` gate keeps yyjson's strict parser
    from raising on rows Jackson would have NULLed."""
    return (
        f"json_extract_string(CASE WHEN json_valid({col})"
        f" THEN {col} END, '{path}')"
    )


def duck_json_bigint(col: str, path: str) -> str:
    """DuckDB twin of ``json_bigint``: integer-token gate + TRY_CAST
    (an ungated DuckDB TRY_CAST rounds '2.5'→3 where Spark NULLs)."""
    s = f"trim({duck_json_string(col, path)})"
    return (
        f"TRY_CAST(CASE WHEN regexp_matches({s}, '^-?[0-9]+$')"
        f" THEN {s} END AS BIGINT)"
    )
