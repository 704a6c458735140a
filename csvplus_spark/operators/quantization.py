"""Embedding quantization for storage-scale pipelines (BASELINE.json
north-star; no reference counterpart).

At 100 TB an `array<float>` embedding column dominates table size;
symmetric int8 quantization cuts it 4× (float32) with ~0.4% worst-case
per-component error, which ANN recall tolerates easily. All arithmetic
here is plain column expressions with a fixed evaluation order, so the
results — including the reconstruction — are bit-identical in the
DuckDB oracle (driver query ``quantize_embeddings``).

``floor(v + 0.5)`` is used instead of ``round`` deliberately: engine
``round`` semantics differ at .5 boundaries (NOTES.md invariant #1),
while floor is exact on identical doubles in every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import with_double_vec


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector quantization, exploded form.

    Returns (id, dim_idx, scale, q, deq): ``scale`` = max |component|,
    ``q`` = floor(x/scale·L + 0.5) with L = 2^(bits−1)−1 (so q ∈
    [−L, L], int8-safe at bits=8), ``deq`` = q·scale/L. Zero vectors
    quantize to all-zero. The packed production form groups this back
    into (scale, array<tinyint>); the exploded form is what the
    cross-engine check hashes.
    """
    levels = (1 << (bits - 1)) - 1
    v = with_double_vec(emb, vec_col)
    scale = F.array_max(F.transform(F.col("__vec__"), lambda x: F.abs(x)))
    ex = (
        v.withColumn("__scale__", scale)
        .select(F.col(id_col), "__scale__",
                F.posexplode("__vec__").alias("__j__", "__x__"))
    )
    qv = (
        F.when(F.col("__scale__") == 0, F.lit(0).cast("long"))
        .otherwise(F.floor(F.col("__x__") / F.col("__scale__") * levels + 0.5))
    )
    return ex.select(
        F.col(id_col),
        (F.col("__j__") + 1).alias("dim_idx"),
        F.col("__scale__").alias("scale"),
        qv.cast("int").alias("q"),
        (qv * F.col("__scale__") / levels).alias("deq"),
    )


def pack_quantized(quant: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, scale, qvec array<tinyint>) — the 4×-smaller storage form."""
    return (
        quant.groupBy(id_col, "scale")
        .agg(F.array_sort(F.collect_list(F.struct("dim_idx", "q"))).alias("__s__"))
        .select(F.col(id_col), "scale",
                F.expr("transform(__s__, x -> cast(x.q as tinyint))").alias("qvec"))
    )


def dequantize(packed: DataFrame, bits: int = 8,
               id_col: str = "vec_id") -> DataFrame:
    """(id, embedding array<double>) reconstructed from the packed form."""
    levels = (1 << (bits - 1)) - 1
    return packed.select(
        F.col(id_col),
        F.transform(
            "qvec", lambda q: q.cast("long") * F.col("scale") / levels
        ).alias("embedding"),
    )
