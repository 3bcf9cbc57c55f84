"""Async Python API for the graft Excel-to-Parquet converter (R12).

Mirrors the reference's `data_to_parquet_bin` package contract
(/root/reference/python_lib/src/data_to_parquet_bin/__init__.py:68-130):
the same `convert_to_parquet` signature and defaults, launcher resolution
with a dev fallback, a single async process boundary, and failure
surfaced as an exception wrapping the subprocess's stderr. Result
communication is purely exit code + the output file, exactly like the
reference.

Where the reference resolves a platform-specific Rust binary, this
package resolves `spark-submit` plus the sbt-packaged application jar
(`sbt package` -> target/scala-2.13/*.jar) and drives
`graft.ExcelToParquet` (the R11 CLI) on a local Spark master. On a
cluster the same wrapper submits against any master via
GRAFT_SPARK_ARGS, since the CLI itself is master-agnostic.

Only the Python standard library is used - no pyspark dependency.
"""

import asyncio
import glob
import os
from pathlib import Path
from typing import Optional

__all__ = ["convert_to_parquet", "GraftToParquetError"]


class GraftToParquetError(Exception):
    """Raised when launcher/jar resolution or the conversion fails."""


def _repo_root() -> Path:
    return Path(__file__).resolve().parent.parent.parent


def _get_spark_submit() -> str:
    """Resolve spark-submit: $GRAFT_SPARK_SUBMIT > $SPARK_HOME/bin >
    /opt/spark/bin > PATH. Mirrors the reference's _get_binary_path
    env-then-fallback chain."""
    override = os.environ.get("GRAFT_SPARK_SUBMIT")
    if override:
        if not Path(override).exists():
            raise GraftToParquetError(f"GRAFT_SPARK_SUBMIT not found: {override}")
        return override
    for base in (os.environ.get("SPARK_HOME"), "/opt/spark"):
        if base:
            cand = Path(base) / "bin" / "spark-submit"
            if cand.exists():
                return str(cand)
    for d in os.environ.get("PATH", "").split(os.pathsep):
        cand = Path(d) / "spark-submit"
        if cand.exists():
            return str(cand)
    raise GraftToParquetError("spark-submit not found (set GRAFT_SPARK_SUBMIT or SPARK_HOME)")


def _get_app_jar() -> str:
    """Resolve the application jar: $GRAFT_JAR, else a jar bundled into
    the installed wheel (hatch_build.py stages it under
    graft_to_parquet/jar/), else the dev fallback of the newest
    `sbt package` jar under <repo>/target/scala-2.13 (the analogue of
    the reference's ../dist dev fallback)."""
    override = os.environ.get("GRAFT_JAR")
    if override:
        if not Path(override).exists():
            raise GraftToParquetError(f"GRAFT_JAR not found: {override}")
        return override
    bundled = sorted((Path(__file__).resolve().parent / "jar").glob("*.jar"))
    if bundled:
        return str(bundled[-1])
    jars = sorted(
        glob.glob(str(_repo_root() / "target" / "scala-2.13" / "*.jar")),
        key=os.path.getmtime,
    )
    if not jars:
        raise GraftToParquetError(
            "application jar not found - run `sbt package` or set GRAFT_JAR"
        )
    return jars[-1]


async def convert_to_parquet(
    input_path: str,
    output_path: str,
    sheet_name: Optional[str] = None,
    sheet_index: Optional[int] = None,
    skip_rows: int = 0,
    batch_size: int = 5000,
) -> None:
    """Asynchronously convert an Excel workbook to Parquet via Spark.

    Args:
        input_path: Path to the input .xlsx or .xlsb file (or a
            directory/glob of workbooks - a Spark-side extension).
        output_path: Path where the output parquet is written.
        sheet_name: Optional sheet name (wins over sheet_index).
        sheet_index: Optional 0-based sheet index.
        skip_rows: Rows to skip at the top of the used range.
        batch_size: Rows per parquet row group (the reference's R8
            contract); 0 delegates to the byte-based writer.

    Raises:
        GraftToParquetError: on resolution failure or nonzero exit,
            carrying the subprocess's stderr tail.
    """
    spark_submit = _get_spark_submit()
    app_jar = _get_app_jar()

    cmd = [spark_submit, "--class", "graft.ExcelToParquet"]
    cmd.extend(os.environ.get("GRAFT_SPARK_ARGS", "--master local[8]").split())
    cmd.extend([
        app_jar,
        "--input", str(input_path),
        "--output", str(output_path),
        "--skip-rows", str(skip_rows),
        "--batch-size", str(batch_size),
    ])
    if sheet_name:
        cmd.extend(["--sheet-name", sheet_name])
    if sheet_index is not None:
        cmd.extend(["--sheet-index", str(sheet_index)])

    process = await asyncio.create_subprocess_exec(
        *cmd, stdout=asyncio.subprocess.PIPE, stderr=asyncio.subprocess.PIPE
    )
    stdout, stderr = await process.communicate()

    if process.returncode != 0:
        # spark-submit mixes framework logging into stderr; surface the
        # CLI's "Error: ..." line when present, else the stderr tail.
        text = stderr.decode(errors="replace")
        lines = [l for l in text.splitlines() if l.startswith("Error: ")]
        detail = lines[-1] if lines else "\n".join(text.splitlines()[-5:])
        raise GraftToParquetError(
            f"Conversion failed (exit code {process.returncode}): {detail}"
        )
