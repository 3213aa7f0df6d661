"""Round-4 closing multimodal queries: perceptual image dedup and
windowed audio features over the REAL stdlib codecs.

Reference parity note: the reference pipeline
(prefect/spark/fifa_spark.py) is tabular-only; these queries extend
the engine with the image/audio columns a large-scale multimodal
training-data pipeline needs, per the build brief. The encode →
decode round-trip runs the real PNG/WAV codecs
(operators/multimodal.py), and because the synthetic payload content
is a closed-form function of doc_id, every decoded statistic is
value-checkable by a DuckDB oracle that recomputes the same integers
from the formula — a hash match proves the codec + feature kernel
byte-exact end-to-end.

- ``q_image_ahash`` — 64-bit average hash (8×8 nearest-neighbor
  downsample, integer mean threshold) per decoded PNG.
- ``q_image_dups`` — the dedup that hash enables: group by the
  16-byte hash, keep buckets with >= 2 images. At 100 TB this is a
  map-only hash extraction + a narrow groupBy — pixels never
  shuffle.
- ``q_audio_features`` — per-160-sample-frame RMS energy + strict
  zero-crossing counts from decoded PCM; one row per frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.multimodal import (
    ahash_png,
    encode_png,
    encode_wav,
    wav_window_features,
)
from fifa_data_pipeline_spark.sources.io import read_table


def _ahash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return ahash_png(encode_png(docs))


def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hash per image, real-codec path (encode → PNG bytes
    → CRC-checked decode → 8×8 aHash)."""
    return _ahash_frame(spark, sf_dir)


def q_image_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup buckets: images agreeing on the full 64-bit
    aHash. The pixel ramp repeats with doc_id period 768
    (lcm(16,12)·4 dims × 256 phase), so true byte-dups exist at any
    corpus size ≥ 768 — and gradient-similar images collide earlier."""
    h = _ahash_frame(spark, sf_dir)
    return (
        h.groupBy("ahash_hi", "ahash_lo")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_imgs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_imgs") >= 2)
    )


def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image NEAR-dup pairs: aHash hamming distance ≤ 3 via the same
    pigeonhole banding as SimHash (4×16-bit bands — recall 1.0 for
    the distance budget by construction), generalized through
    ``dedup.hamming_pairs_64``. The oracle is the brute-force n²
    hamming scan, so a hash match proves the banded plan loses no
    pair. Scale shape: band-bucket groupBy, never a self cross-join.
    The degenerate-bucket guard is lifted here (synthetic ramp images
    legitimately concentrate band values, and the oracle has no cap);
    production near-dup would keep the default cap and route over-full
    buckets to exact dedup, as simhash_pairs documents."""
    from fifa_data_pipeline_spark.operators.dedup import hamming_pairs_64

    sigs = _ahash_frame(spark, sf_dir).select(
        "doc_id",
        F.shiftleft(F.col("ahash_hi"), 32)
        .bitwiseOR(F.col("ahash_lo"))
        .alias("sig64"),
    )
    return hamming_pairs_64(
        sigs, "doc_id", "sig64", max_hamming=3, max_bucket_size=1_000_000
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS + zero-crossing features from real WAV decode."""
    docs = read_table(spark, sf_dir, "documents")
    feats = wav_window_features(encode_wav(docs), window=160)
    return feats.select(
        "doc_id",
        "win_idx",
        "n_samples",
        F.round("rms", 6).alias("rms"),
        "n_zero_cross",
    )


QUERIES = {
    "q_image_ahash": q_image_ahash,
    "q_image_dups": q_image_dups,
    "q_image_near_dup": q_image_near_dup,
    "q_audio_features": q_audio_features,
}

#: aHash oracle: the encoder's pixel (r, c) of image doc_id is
#: (doc_id + r·w + c) % 256, so the 64 sampled grid pixels — and
#: therefore the packed hash — are pure integer arithmetic.
_AHASH_SQL = """
    WITH dims AS (
      SELECT doc_id,
             CAST((doc_id % 16 + 1) * 4 AS BIGINT) AS w,
             CAST((doc_id % 12 + 1) * 4 AS BIGINT) AS h
      FROM documents),
    samp AS (
      SELECT doc_id, i.i * 8 + j.j AS k,
             (doc_id + (((2 * i.i + 1) * h) // 16) * w
                     + (((2 * j.j + 1) * w) // 16)) % 256 AS px
      FROM dims, UNNEST(range(0, 8)) i(i), UNNEST(range(0, 8)) j(j)),
    tot AS (SELECT doc_id, SUM(px) AS s FROM samp GROUP BY doc_id),
    bits AS (
      SELECT samp.doc_id, k,
             CASE WHEN 64 * px >= s THEN 1 ELSE 0 END AS b
      FROM samp JOIN tot USING (doc_id))
    SELECT doc_id,
           CAST(SUM(CASE WHEN k < 32
                         THEN b * (CAST(1 AS BIGINT) << (31 - k))
                         ELSE 0 END) AS BIGINT) AS ahash_hi,
           CAST(SUM(CASE WHEN k >= 32
                         THEN b * (CAST(1 AS BIGINT) << (63 - k))
                         ELSE 0 END) AS BIGINT) AS ahash_lo
    FROM bits GROUP BY doc_id
"""

ORACLES = {
    "q_image_ahash": _AHASH_SQL,
    "q_image_dups": f"""
        WITH ahash AS ({_AHASH_SQL})
        SELECT ahash_hi, ahash_lo,
               CAST(COUNT(*) AS BIGINT) AS n_imgs,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM ahash GROUP BY ahash_hi, ahash_lo
        HAVING COUNT(*) >= 2
    """,
    "q_image_near_dup": f"""
        WITH ahash AS ({_AHASH_SQL})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
                    + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS INT)
                 AS hamming
        FROM ahash a JOIN ahash b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
              + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= 3
    """,
    # Sample k of doc_id is amp·((k % 256) − 128); the oracle
    # regenerates the PCM stream numerically and windows it in SQL —
    # no closed form needed, every intermediate is exact int64.
    "q_audio_features": """
        WITH params AS (
          SELECT doc_id,
                 CAST((doc_id % 20 + 1) * 160 AS BIGINT) AS n,
                 CAST(doc_id % 8 + 1 AS BIGINT) AS amp
          FROM documents),
        samp AS (
          SELECT doc_id, k.k AS k, k.k // 160 AS win,
                 amp * ((k.k % 256) - 128) AS v
          FROM params, UNNEST(range(0, n)) k(k)),
        lagged AS (
          SELECT *, lag(v) OVER (
                   PARTITION BY doc_id, win ORDER BY k) AS pv
          FROM samp)
        SELECT doc_id,
               CAST(win AS INT) AS win_idx,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               ROUND(sqrt(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)), 6)
                 AS rms,
               CAST(SUM(CASE WHEN pv IS NOT NULL AND v * pv < 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_zero_cross
        FROM lagged GROUP BY doc_id, win
    """,
}
