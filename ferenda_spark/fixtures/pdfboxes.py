"""Deterministic synthetic PDF textbox fixture for the pdf_metrics
oracle row: 20 documents x 4 pages x 30 boxes, every field pure
integer arithmetic on (d, p, b) so the DuckDB oracle regenerates the
identical table from range(2400).

Layout per page: box b=0 is a small page-header line (top 40), b=29 a
page-footer line near the bottom, b=1..28 the body column.  Per-doc
variation: page dims (d%3, d%2), left base (d%3), header/footer char
counts (d%4, d%3) — so the analyzer's threshold scans, mode/bin
margins and style ranking all produce doc-dependent answers,
including one deliberate right-bin TIE (d%3==1 odd pages: bins 720
and 730 both count 11 -> the reference's largest-candidate rule
picks 730)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCS, PAGES, PER_PAGE = 20, 4, 30


def synth_pdf_boxes(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """(pages_df, boxes_df) in the operators/pdfanalyze.py input
    contract."""
    raw = (spark.range(DOCS * PAGES * PER_PAGE)
           .select(F.expr(f"id div {PAGES * PER_PAGE}").alias("d"),
                   F.expr(f"(id div {PER_PAGE}) % {PAGES} + 1").alias("p"),
                   (F.col("id") % PER_PAGE).alias("b")))
    d, p, b = F.col("d"), F.col("p"), F.col("b")
    pw = F.lit(800) + (d % 3) * 40
    ph = F.lit(1200) + (d % 2) * 60
    is_hdr, is_ftr = b == 0, b == 29
    left = (F.when(is_hdr | is_ftr, F.lit(100) + (d % 3) * 10)
            .otherwise(F.when(p % 2 == 1, 120).otherwise(95)
                       + (d % 3) * 5
                       + F.when(b % 6 == 0, 25).otherwise(0)))
    top = (F.when(is_hdr, 40).when(is_ftr, ph - 50)
           .otherwise(F.lit(100) + b * 35))
    bottom = F.when(is_hdr, 52).when(is_ftr, ph - 38).otherwise(top + 20)
    width = (F.when(is_hdr, 200).when(is_ftr, 150)
             .when(b % 9 == 0, 655)
             .otherwise(F.lit(600) - (b % 7) * 2))
    # style CASE order matters (b=20 hits both %13 and %17 rules):
    # header/footer -> b==1 -> b%10==5 -> b%13==7 -> b%17==3 -> default
    family = (F.when(is_hdr | is_ftr, "Sans")
              .when(b == 1, "Serif-Bold")
              .when(b % 10 == 5, "Serif-Bold")
              .when(b % 13 == 7, "Serif-Italic")
              .when(b % 17 == 3, "Sans-Bold")
              .otherwise("Sans"))
    size = (F.when(is_hdr | is_ftr, 14)
            .when(b == 1, 19).when(b % 10 == 5, 17)
            .when(b % 13 == 7, 15).when(b % 17 == 3, 14)
            .otherwise(14))
    nchars = (F.when(is_hdr, F.lit(2) + (d % 4) * 6)
              .when(is_ftr, F.lit(2) + (d % 3) * 8)
              .when(b == 1, 40)
              .when(b % 10 == 5, F.lit(30) + (d % 5))
              .when(b % 13 == 7, 25)
              .when(b % 17 == 3, 20)
              .otherwise(F.lit(70) + b % 11))
    doc_id = F.format_string("doc-%02d", d)
    boxes = raw.select(
        doc_id.alias("doc_id"), p.cast("int").alias("page"),
        left.cast("int").alias("left"), top.cast("int").alias("top"),
        (left + width).cast("int").alias("right"),
        bottom.cast("int").alias("bottom"),
        nchars.cast("int").alias("nchars"),
        family.alias("family"), size.cast("int").alias("size"),
        F.lit("").alias("text"), pw.cast("int").alias("pw"),
        ph.cast("int").alias("ph"))
    pages = (boxes.select("doc_id", "page",
                          F.col("pw").alias("width"),
                          F.col("ph").alias("height"))
             .distinct())
    return pages, boxes.drop("pw", "ph")


# the same generator as a DuckDB CTE (kept textually adjacent so the
# two stay in lockstep — any change here must change synth_pdf_boxes)
BOXES_CTE = """
raw AS (
  SELECT id // 120 AS d, (id // 30) % 4 + 1 AS p, id % 30 AS b
  FROM range(2400) t(id)
),
boxes AS (
  SELECT 'doc-' || lpad(CAST(d AS VARCHAR), 2, '0') AS doc_id,
    CAST(p AS INT) AS page,
    CAST(800 + (d % 3) * 40 AS INT) AS pw,
    CAST(1200 + (d % 2) * 60 AS INT) AS ph,
    CAST(CASE WHEN b = 0 OR b = 29 THEN 100 + (d % 3) * 10
         ELSE (CASE WHEN p % 2 = 1 THEN 120 ELSE 95 END) + (d % 3) * 5
              + (CASE WHEN b % 6 = 0 THEN 25 ELSE 0 END) END AS INT)
      AS lft,
    CAST(CASE WHEN b = 0 THEN 40
              WHEN b = 29 THEN 1200 + (d % 2) * 60 - 50
         ELSE 100 + b * 35 END AS INT) AS top,
    CAST(CASE WHEN b = 0 THEN 52
              WHEN b = 29 THEN 1200 + (d % 2) * 60 - 38
         ELSE 100 + b * 35 + 20 END AS INT) AS bottom,
    CAST(CASE WHEN b = 0 THEN 200 WHEN b = 29 THEN 150
              WHEN b % 9 = 0 THEN 655
         ELSE 600 - (b % 7) * 2 END AS INT) AS wdt,
    CASE WHEN b = 0 OR b = 29 THEN 'Sans'
         WHEN b = 1 THEN 'Serif-Bold'
         WHEN b % 10 = 5 THEN 'Serif-Bold'
         WHEN b % 13 = 7 THEN 'Serif-Italic'
         WHEN b % 17 = 3 THEN 'Sans-Bold'
         ELSE 'Sans' END AS family,
    CAST(CASE WHEN b = 0 OR b = 29 THEN 14
              WHEN b = 1 THEN 19
              WHEN b % 10 = 5 THEN 17
              WHEN b % 13 = 7 THEN 15
              WHEN b % 17 = 3 THEN 14
         ELSE 14 END AS INT) AS size,
    CAST(CASE WHEN b = 0 THEN 2 + (d % 4) * 6
              WHEN b = 29 THEN 2 + (d % 3) * 8
              WHEN b = 1 THEN 40
              WHEN b % 10 = 5 THEN 30 + (d % 5)
              WHEN b % 13 = 7 THEN 25
              WHEN b % 17 = 3 THEN 20
         ELSE 70 + b % 11 END AS INT) AS nchars
  FROM raw
),
bx AS (SELECT *, lft + wdt AS rgt FROM boxes),
pages AS (SELECT DISTINCT doc_id, page, pw AS width, ph AS height
          FROM boxes)
"""
