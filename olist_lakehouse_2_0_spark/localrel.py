"""Arrow-backed local relations for driver-computed row lists.

``spark.createDataFrame(list_of_tuples, schema)`` builds a PICKLED
local relation: every downstream action ships the rows to a Python
worker and evaluates them there — measured on this engine's harness at
~1 s per action and up to 6–8 s when the relation feeds a file write
(the write task pays a fresh Python-worker round trip outside the
reused-daemon fast path). The Arrow path (``createDataFrame`` from a
pandas frame, ``spark.sql.execution.arrow.pyspark.enabled=true``)
materializes the same rows as an Arrow batch ONCE at creation and
hands the JVM a columnar local relation — measured ~25x cheaper on the
write path (guide §6 "Arrow for driver transfers").

Every driver-computed row list in a query path goes through
:func:`arrow_local_relation`; the values and the declared schema are
exactly what the pickled path received, so results are unchanged —
only the transfer encoding differs. On any conversion surprise
(unsupported type, pandas coercion error) it falls back to the pickled
path rather than failing the query, logging once per process so a
silent permanent degradation is visible (ADVICE r10 #2).

CONTRACT (ADVICE r10 #2): timestamp/date columns are OUT of contract —
the pandas→Arrow path applies session-timezone localization semantics
that can differ from the pickled path, so datetime values are routed
to the pickled fallback explicitly rather than risking a silent shift.
Every current caller passes ints/floats/strings/bools only.
"""

from __future__ import annotations

import datetime
import logging
from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

_log = logging.getLogger(__name__)
_fallback_logged = False


def _log_fallback_once(reason: str) -> None:
    global _fallback_logged
    if not _fallback_logged:
        _fallback_logged = True
        _log.warning(
            "arrow_local_relation: falling back to the pickled local "
            "relation (%s); subsequent fallbacks are silent",
            reason,
        )


def arrow_local_relation(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` via the Arrow encoding.

    ``rows`` is a driver-side list of tuples (bounded, planning-sized —
    the repo-wide contract for local relations); ``schema`` is the DDL
    string or ``StructType`` naming every column. Columns are kept ``dtype=object`` in
    the intermediate pandas frame so pandas never coerces values (a
    long column with a ``None`` would otherwise become float64 and
    corrupt >2^53 ids); Arrow converts each object column straight to
    the declared Spark type.
    """
    rows = list(rows)
    if not rows:
        # Nothing to transfer — the pickled empty relation never pays
        # a Python round trip worth the pandas detour.
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd

        from pyspark.sql.types import StructType, _parse_datatype_string

        struct = (
            schema
            if isinstance(schema, StructType)
            else _parse_datatype_string(schema)
        )
        names = [f.name for f in struct.fields]
        # datetime/date values are out of contract (module docstring):
        # route them to the pickled path before pandas can apply
        # session-timezone localization the pickled path would not.
        if any(
            isinstance(v, (datetime.date, datetime.datetime))
            for r in rows
            for v in r
        ):
            _log_fallback_once("datetime/date values are out of contract")
            return spark.createDataFrame(rows, schema)
        data = {
            name: pd.Series([r[i] for r in rows], dtype=object)
            for i, name in enumerate(names)
        }
        pdf = pd.DataFrame(data, columns=names)
        return spark.createDataFrame(pdf, schema)
    except Exception as exc:
        # Conversion surprise: keep correctness, lose the speedup.
        _log_fallback_once(f"conversion error: {exc!r}")
        return spark.createDataFrame(rows, schema)
