"""Catalog: multimodal binary-column plumbing.

Binary payloads are synthesized deterministically from document text
(some rows get a PNG magic prefix) so the metadata/sniffing path is
oracle-checkable; decode plumbing is pytest-driven (no media libs here).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.operators import multimodal as MM
from azuredataengineering_deeplearning_spark.sources.readers import read_parquet


@query(
    "mm_binary_metadata",
    """
    WITH b AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN from_hex('89504E47') || encode(text)
                  ELSE encode(text) END AS blob
      FROM documents
    )
    SELECT doc_id, octet_length(blob) AS blob_size,
           md5(hex(blob)) AS blob_md5,
           CASE WHEN substr(hex(blob), 1, 8) = '89504E47' THEN 'png'
                ELSE 'unknown' END AS blob_format
    FROM b
    """,
)
def mm_binary_metadata(spark, sf_dir):
    """Opaque-binary metadata: size, content hash, magic-byte format
    sniff — one scan, no decode."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    blob = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.unhex(F.lit("89504E47")), F.encode(F.col("text"), "UTF-8")),
    ).otherwise(F.encode(F.col("text"), "UTF-8"))
    withmeta = MM.binary_metadata(d.select("doc_id", blob.alias("blob")), "blob")
    return withmeta.select(
        "doc_id",
        F.col("blob_size"),
        F.md5(F.hex("blob")).alias("blob_md5"),
        F.col("blob_format"),
    )
