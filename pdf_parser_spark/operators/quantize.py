"""Int8 embedding quantization for the similarity tier.

At 100 TB the embedding column dominates scan bytes (a 768-d float32
vector is 3 KB/row); symmetric per-vector int8 quantization cuts that 4x
— the difference between an I/O-bound and a CPU-bound similarity scan —
at <1 % top-k disturbance for cosine (scales cancel: see
:func:`quantized_cosine`). The reference never compresses its vectors
(its whole corpus is ~500 MB in-process, reference
CHROMA_MIGRATION_GUIDE.md:96); this is a training-pipeline extension the
task brief's scale target requires.

Everything is exactly recomputable in DuckDB (oracle entry
``emb_quantized_topk``): quantization uses half-away-from-zero rounding
written as ``trunc(x/scale + copysign(0.5, x))`` so numpy (which would
default to banker's rounding via ``np.round``) and SQL ``round()``
agree bit-for-bit.

Quantization runs in ONE Arrow-batched pandas pass (per-row scale +
rounded array). A JVM-expression rendition would reference the
``array_max`` scale inside the per-element ``transform`` lambda and
Catalyst's projection collapse re-inlines it per element (the PLANS.md
§8 trap — O(dim^2) per row); the batched numpy form is O(dim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_py(vec: list[float]) -> tuple[list[int], float]:
    """(int8 values, scale) — the scalar oracle twin of the UDF.

    scale = max|x| / 127; q_i = trunc(x_i/scale + copysign(0.5, x_i))
    (half away from zero, matching SQL ``round``). All-zero vectors get
    scale 0 and an all-zero q.
    """
    import math
    m = max((abs(float(x)) for x in vec), default=0.0)
    scale = m / 127.0
    if scale == 0.0:
        return [0] * len(vec), 0.0
    return [int(math.trunc(float(x) / scale + math.copysign(0.5, float(x))))
            for x in vec], scale


def _quantize_udf():
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   StructField, StructType)

    out_t = StructType([StructField("q", ArrayType(IntegerType())),
                        StructField("scale", DoubleType())])

    def quant(batch):  # pd.Series of array<float> -> pd.DataFrame
        qs, ss = [], []
        for v in batch:
            x = np.asarray(v, dtype=np.float64)
            m = float(np.max(np.abs(x))) if x.size else 0.0
            s = m / 127.0
            if s == 0.0:
                qs.append([0] * len(x))
            else:
                qs.append(np.trunc(x / s + np.copysign(0.5, x))
                          .astype(np.int32).tolist())
            ss.append(s)
        return pd.DataFrame({"q": qs, "scale": ss})

    return pandas_udf(quant, out_t)


def quantize_embeddings(df: DataFrame, emb_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """(id, q: array<int> in [-127, 127], q_scale: double)."""
    udf = _quantize_udf()
    qs = df.select(F.col(id_col).alias(id_col),
                   udf(F.col(emb_col)).alias("_qs"))
    return qs.select(id_col, F.col("_qs.q").alias("q"),
                     F.col("_qs.scale").alias("q_scale"))


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over two int8 arrays — the per-vector scales CANCEL
    (cos = s_a*s_b*Σqa·qb / (s_a|qa| * s_b|qb|)), so scoring needs only
    the integer arrays: an integer dot product in whole-stage codegen,
    no float decode of the stored column at all."""
    d = F.aggregate(F.zip_with(qa, qb, lambda x, y: (x * y).cast("long")),
                    F.lit(0).cast("long"), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(qa, F.lit(0).cast("long"),
                            lambda acc, v: acc + (v * v).cast("long"))
                .cast("double"))
    nb = F.sqrt(F.aggregate(qb, F.lit(0).cast("long"),
                            lambda acc, v: acc + (v * v).cast("long"))
                .cast("double"))
    return F.when(na * nb > 0, d.cast("double") / (na * nb)) \
            .otherwise(F.lit(0.0))


def quantized_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                   emb_col: str = "embedding", id_col: str = "vec_id",
                   ) -> DataFrame:
    """Exact top-k over the QUANTIZED representation: quantize the corpus
    (one Arrow pass; in production the table stores q/q_scale and the
    scan reads 1/4 the bytes), quantize the query with the same formula,
    integer-dot cosine, TakeOrderedAndProject."""
    qv, _ = quantize_py([float(x) for x in query_vec])
    qc = F.array(*[F.lit(int(x)) for x in qv])
    scored = quantize_embeddings(df, emb_col, id_col).select(
        id_col,
        F.round(quantized_cosine(F.col("q"), qc), 6).alias("similarity"))
    return scored.orderBy(F.desc("similarity"), F.col(id_col).asc()) \
                 .limit(k)
