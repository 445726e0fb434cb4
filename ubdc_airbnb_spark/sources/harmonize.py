"""Schema harmonization for multi-drop ingestion — the real-world entry
condition of a 100 TB corpus: monthly crawl drops whose parquet schemas
drift (columns added/removed, ints widened to longs, floats to doubles),
which naive ``unionByName`` rejects and naive ``mergeSchema`` resolves
only for compatible-by-Spark's-rules cases.

``harmonize`` aligns any number of frames to one target schema:
- the union of all column names, in first-seen order;
- per-column least-common numeric type along the safe widening chain
  (byte→short→int→long→double; float→double); otherwise the types must
  agree exactly — a genuine conflict (string vs long) raises instead of
  silently corrupting, because type drift that isn't a widening is a
  data bug upstream;
- frames missing a column carry typed NULLs.

Everything is narrow per-frame projections + ``unionByName`` — no
shuffle, no data movement beyond the reads themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: safe widening chain: any type may widen to one appearing later in its
#: chain; the merged type is the furthest-along of the two.
_NUMERIC_ORDER = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.DoubleType(),
]
_FLOAT_ORDER = [T.FloatType(), T.DoubleType()]


def _merge_type(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    for chain in (_NUMERIC_ORDER, _FLOAT_ORDER):
        if a in chain and b in chain:
            return chain[max(chain.index(a), chain.index(b))]
    # int-family vs float-family: widen to double
    if (a in _NUMERIC_ORDER or a in _FLOAT_ORDER) and (
        b in _NUMERIC_ORDER or b in _FLOAT_ORDER
    ):
        return T.DoubleType()
    raise TypeError(f"incompatible schema drift: {a.simpleString()} vs {b.simpleString()}")


def merged_schema(frames: list[DataFrame]) -> list[tuple[str, T.DataType]]:
    """Union of column names (first-seen order) with per-column merged
    types; raises TypeError on non-widening conflicts."""
    out: dict[str, T.DataType] = {}
    order: list[str] = []
    for df in frames:
        for f in df.schema.fields:
            if f.name not in out:
                out[f.name] = f.dataType
                order.append(f.name)
            else:
                out[f.name] = _merge_type(out[f.name], f.dataType)
    return [(name, out[name]) for name in order]


def harmonize(frames: list[DataFrame], source_col: str | None = None) -> DataFrame:
    """Union all frames under the merged schema. With ``source_col``,
    tag every row with its frame index (drop provenance)."""
    target = merged_schema(frames)
    aligned = []
    for i, df in enumerate(frames):
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = [
            (
                F.col(name).cast(dtype)
                if name in have
                else F.lit(None).cast(dtype)
            ).alias(name)
            for name, dtype in target
        ]
        if source_col is not None:
            cols.append(F.lit(i).cast("int").alias(source_col))
        aligned.append(df.select(*cols))
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out
