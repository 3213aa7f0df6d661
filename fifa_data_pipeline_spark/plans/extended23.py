"""Round-6 batch 1: real PNG codec path for the multimodal surface.

- ``q_png_decode`` — encode a valid grayscale-8 PNG per document
  (stdlib zlib/struct, deterministic pixel content), then DECODE it
  back (chunk walk + CRC validation + zlib inflate + scanline
  de-filtering) and aggregate pixel stats. Unlike the fake-kernel
  multimodal demos, this is a real container+entropy codec, and the
  oracle INDEPENDENTLY recomputes the decoded statistics from the
  pixel formula ``pixel(k) = (doc_id + k) % 256`` — so a hash match
  proves the bytes really round-tripped through deflate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.multimodal import (
    decode_png,
    encode_png,
)
from fifa_data_pipeline_spark.sources.io import read_table


def q_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG encode → decode round-trip over the documents table; the
    decoded width/height/pixel-mean must equal what the generator
    formula predicts (checked by the DuckDB oracle)."""
    docs = read_table(spark, sf_dir, "documents")
    return decode_png(encode_png(docs)).select(
        "doc_id",
        "width",
        "height",
        "n_pixels",
        F.round("mean_pixel", 6).alias("mean_pixel"),
    )


QUERIES = {"q_png_decode": q_png_decode}

ORACLES = {
    # The pixel sequence (doc_id + k) % 256 is periodic, so the
    # oracle predicts the decoded pixel SUM in closed form (full
    # 0..255 cycles + a split partial cycle) — no series expansion.
    "q_png_decode": """
        WITH dims AS (
          SELECT doc_id,
                 CAST((doc_id % 16 + 1) * 4 AS INT) AS width,
                 CAST((doc_id % 12 + 1) * 4 AS INT) AS height,
                 CAST(((doc_id % 16 + 1) * 4)
                      * ((doc_id % 12 + 1) * 4) AS BIGINT) AS n,
                 doc_id % 256 AS d
          FROM documents),
        parts AS (
          SELECT *, n // 256 AS q, n % 256 AS r FROM dims),
        sums AS (
          SELECT *, q * 32640 +
                 CASE WHEN d + r <= 256
                      THEN r * d + r * (r - 1) // 2
                      ELSE (d + 255) * (256 - d) // 2
                           + (d + r - 256) * (d + r - 257) // 2
                 END AS total
          FROM parts)
        SELECT doc_id, width, height, n AS n_pixels,
               ROUND(CAST(total AS DOUBLE) / n, 6) AS mean_pixel
        FROM sums
    """,
}
