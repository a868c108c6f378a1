"""The shared md5-to-uniform content-hash draw — ONE home for the
determinism kernel the sampling-adjacent operators all build on
(reservoir's ES keys, crops/corruption/fim's span geometry). The
sampling.py doctrine in one place: a "random" number derived from
``md5(id || ':' || salt)`` is identical across partitioning,
retries, and engines, and replicable in pure Python for
differential tests.

Invariant: 13 hex chars => the hash integer is < 16^13 < 2^53 and
therefore EXACT as an IEEE double — the property every consumer's
test replicates with ``int(hashlib.md5(...).hexdigest()[:13], 16)``.
Changing the width or the salt format here is a breaking change for
every persisted sample/crop; that is exactly why there is one copy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 13
SPACE = float(16**HEX_CHARS)


def md5_uniform_key(key: Column, open_interval: bool = False) -> Column:
    """Deterministic uniform from the content hash of the ALREADY
    COMPOSED key string: in [0, 1) by default, or (0, 1) with
    ``open_interval`` (the +1/(SPACE+1) shift — consumers that take
    ``ln(u)`` need u strictly positive). Use this form when part of
    the salt is itself a column (e.g. a block index)."""
    h = F.conv(
        F.substring(F.md5(key), 1, HEX_CHARS), 16, 10
    ).cast("double")
    if open_interval:
        return (h + F.lit(1.0)) / F.lit(SPACE + 1.0)
    return h / F.lit(SPACE)


def md5_uniform(
    id_col: Column, salt: str, open_interval: bool = False
) -> Column:
    """The common static-salt form: uniform from
    ``md5(id || ':' || salt)``."""
    return md5_uniform_key(
        F.concat(id_col.cast("string"), F.lit(f":{salt}")),
        open_interval=open_interval,
    )
