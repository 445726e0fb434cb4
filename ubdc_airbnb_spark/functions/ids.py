"""C9: random identifiers (ref ubdc_airbnb/utils/__init__.py:4-10,
management/commands/create-test-area.py:7-9).

Two surfaces, mirroring how the reference uses them:

- driver-side helpers (naming a test area, tagging a job run) — plain
  Python, optionally seeded for deterministic tests;
- column expressions for per-row ids at scale — JVM-side ``uuid()`` /
  ``rand()``-derived so a 100 TB table never round-trips through Python.
"""

from __future__ import annotations

import random
import string
import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALNUM = string.ascii_letters + string.digits


def get_random_string(length: int = 10, rng: random.Random | None = None) -> str:
    """Random alphanumeric string (ref utils/__init__.py:4-10; the
    lowercase-only 5-char flavor in create-test-area.py:7-9 is
    ``get_random_string(5, rng)`` over its own alphabet — we keep one
    helper with the superset alphabet)."""
    r = rng or random
    return "".join(r.choice(_ALNUM) for _ in range(length))


def new_uuid() -> str:
    """Driver-side UUID4 string."""
    return str(uuid.uuid4())


def uuid_col() -> Column:
    """Per-row UUID4 column — evaluated JVM-side, one per output row."""
    return F.expr("uuid()")


def random_string_col(length: int = 10, seed: int | None = None) -> Column:
    """Per-row random hex string of ``length`` chars. Built from
    ``rand()`` + md5 so it stays inside whole-stage codegen; pass
    ``seed`` for reproducible tests."""
    r = F.rand(seed) if seed is not None else F.rand()
    return F.substring(F.md5(r.cast("string")), 1, length)
