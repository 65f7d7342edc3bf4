"""Elapsed-duration formatting (SURVEY.md §2.8 F8; reference
/root/reference/graven/shared/timer.py:72-81 formats elapsed seconds as
``hh:mm:ss`` for log/report lines)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_FMT = "%02d:%02d:%02d"


def format_hms(seconds: Column) -> Column:
    """Integer seconds → ``hh:mm:ss`` (JVM-side format_string)."""
    h = F.floor(seconds / 3600).cast("int")
    m = F.floor((seconds % 3600) / 60).cast("int")
    s = (seconds % 60).cast("int")
    return F.format_string(_FMT, h, m, s)


def format_hms_py(seconds: float) -> str:
    """Driver-side twin (CLI elapsed lines), same format string."""
    sec = int(seconds)
    return _FMT % (sec // 3600, (sec % 3600) // 60, sec % 60)
