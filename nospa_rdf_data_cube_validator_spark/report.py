"""Validation-report sink (reference operator S3).

The reference renders one section per IC — header, "Pass." or itemized
violations — through a log4j appender into ``validation_result_<ts>.md``
(nonsparql/NospaValidator.java:445-490, resources/log4j.xml:24-33). Here the
markdown report collects a bounded sample per IC for humans, and the full
violation tables land in parquet for programmatic P/R scoring — at 100 TB
the parquet tables are the contract, the markdown is a preview.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import DataFrame

IC_TITLES = {
    "ic1": "Integrity Constraint 1: Unique DataSet",
    "ic2": "Integrity Constraint 2: Unique DSD",
    "ic3": "Integrity Constraint 3: DSD Includes Measure",
    "ic4": "Integrity Constraint 4: Dimensions Have Range",
    "ic5": "Integrity Constraint 5: Concept Dimensions Have Code Lists",
    "ic6": "Integrity Constraint 6: Only Attributes May Be Optional",
    "ic7": "Integrity Constraint 7: Slice Keys Must Be Declared",
    "ic8": "Integrity Constraint 8: Slice Keys Consistent With DSD",
    "ic9": "Integrity Constraint 9: Unique Slice Structure",
    "ic10": "Integrity Constraint 10: Slice Dimensions Complete",
    "ic11": "Integrity Constraint 11: All Dimensions Required",
    "ic12": "Integrity Constraint 12: No Duplicate Observations",
    "ic13": "Integrity Constraint 13: Required Attributes",
    "ic14": "Integrity Constraint 14: All Measures Present",
    "ic15": "Integrity Constraint 15: Measure Dimension Consistent",
    "ic16": "Integrity Constraint 16: Single Measure On Measure Dimension Observation",
    "ic17": "Integrity Constraint 17: All Measures Present In Measures Dimension Cube",
    "ic18": "Integrity Constraint 18: Consistent Dataset Links",
    "ic19": "Integrity Constraint 19: Codes From Code List",
    "ic20": "Integrity Constraint 20: Codes From Hierarchy",
    "ic21": "Integrity Constraint 21: Codes From Hierarchy (Inverse)",
}


def write_validation_report(
    violations: dict[str, DataFrame],
    md_path: str | None = None,
    parquet_dir: str | None = None,
    sample_rows: int = 50,
) -> str:
    """Render per-IC sections; persist full tables to parquet if requested.

    Returns the markdown text. Violation DataFrames are sorted by their
    first column before sampling so reports are deterministic (the reference
    emits hash order; SURVEY.md §2.6 documents the deliberate improvement).
    """
    ts = datetime.datetime.now().strftime("%Y%m%d%H%M%S")
    lines = [f"# Validation result ({ts})", ""]
    for name, df in violations.items():
        title = IC_TITLES.get(name, name)
        lines += [f"## {title}", ""]
        first_col = df.columns[0]
        sample = df.orderBy(first_col).limit(sample_rows + 1).collect()
        if parquet_dir is not None:
            df.write.mode("overwrite").parquet(os.path.join(parquet_dir, name))
        if not sample:
            lines += ["Pass.", ""]
            continue
        header = "| " + " | ".join(df.columns) + " |"
        sep = "|" + "---|" * len(df.columns)
        lines += [header, sep]
        for row in sample[:sample_rows]:
            lines.append("| " + " | ".join(str(v) for v in row) + " |")
        if len(sample) > sample_rows:
            lines.append(f"| ... truncated at {sample_rows} rows ... |")
        lines.append("")
    text = "\n".join(lines)
    if md_path is not None:
        if os.path.isdir(md_path):
            md_path = os.path.join(md_path, f"validation_result_{ts}.md")
        with open(md_path, "w", encoding="utf-8") as fh:
            fh.write(text)
    return text
