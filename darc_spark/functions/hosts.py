"""I2P hosts.txt parsing (``darc/proxy/i2p.py:282-307`` semantics).

Lines ``name.i2p=b64key``; comments (#) and blanks skipped; only hosts
fullmatching ``.*?\\.i2p`` kept; each becomes ``http://<host>``.

This one is pure string surgery, so it stays **entirely JVM-side**:
split lines → explode → split_part('=') → anchored rlike. No Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_i2p_hosts(df: DataFrame, text_col: str = "text", src_col: str | None = None) -> DataFrame:
    """rows(text) → rows(host, url) of valid .i2p entries — native SQL only."""
    lines = df.select(
        *([F.col(src_col)] if src_col else []),
        F.explode(F.split(F.col(text_col), "\r?\n")).alias("line"),
    ).select(
        *([F.col(src_col)] if src_col else []),
        F.trim(F.col("line")).alias("line"),
    )
    hosts = (
        lines.filter((F.col("line") != "") & ~F.col("line").startswith("#"))
        .withColumn("host", F.split_part(F.col("line"), F.lit("="), F.lit(1)))
        .filter(F.col("host").rlike(r"^(?:.*?\.i2p)$"))
        .withColumn("url", F.concat(F.lit("http://"), F.col("host")))
        .drop("line")
    )
    return hosts
