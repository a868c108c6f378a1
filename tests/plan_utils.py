"""Shared helpers for parsing `explain("formatted")` output in plan
tests (one copy, so a Spark explain-format change is fixed in one
place)."""

from __future__ import annotations

import contextlib
import io
import re


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def window_arguments(plan: str) -> tuple[list[str], list[str]]:
    """(unpartitioned, partitioned) Window-node Arguments lines. In
    formatted explain a Window's Arguments line has 3 bracket groups
    when partitioned (fns, partition spec, order) and 2 when
    unpartitioned (fns, order)."""
    args = re.findall(r"\(\d+\) Window\n(?:.+\n)*?Arguments: (.+)", plan)
    unpartitioned = [a for a in args if len(re.findall(r"\], \[", a)) == 1]
    partitioned = [a for a in args if len(re.findall(r"\], \[", a)) == 2]
    return unpartitioned, partitioned
