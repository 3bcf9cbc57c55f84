"""Automated R12 contract tests for graft_to_parquet (stdlib only).

Three layers, mirroring the reference package's own test surface
(/root/reference/python_lib/src/data_to_parquet_bin/__init__.py:68-131):

1. resolution errors - no JVM needed
2. failure wrapping - a fake spark-submit exercises the stderr-surfacing
   contract without a JVM
3. real end-to-end (happy path + unsupported-extension exit-1) - only
   when the caller provides GRAFT_JAR (the sbt PythonApiSpec does);
   skipped otherwise so `python3 tests/test_api.py` stays fast.
"""
import asyncio
import os
import shutil
import sys
import tempfile
import unittest
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from graft_to_parquet import GraftToParquetError, convert_to_parquet  # noqa: E402


def make_xlsx(path, n_rows=7):
    """Minimal real xlsx: workbook + one sheet, inline strings + numbers."""
    rows = ['<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c>'
            '<c r="B1" t="inlineStr"><is><t>v</t></is></c></row>']
    for i in range(1, n_rows + 1):
        rows.append(f'<row r="{i + 1}"><c r="A{i + 1}"><v>{i}</v></c>'
                    f'<c r="B{i + 1}"><v>{i * 2}</v></c></row>')
    sheet = ('<?xml version="1.0"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(rows) + '</sheetData></worksheet>')
    workbook = ('<?xml version="1.0"?>'
                '<workbook xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheets>'
                '<sheet name="data" sheetId="1"/></sheets></workbook>')
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def run(coro):
    return asyncio.get_event_loop().run_until_complete(coro)


class ResolutionTests(unittest.TestCase):
    def setUp(self):
        self._env = dict(os.environ)

    def tearDown(self):
        os.environ.clear()
        os.environ.update(self._env)

    def test_missing_spark_submit_override(self):
        os.environ["GRAFT_SPARK_SUBMIT"] = "/nonexistent/spark-submit"
        with self.assertRaises(GraftToParquetError) as cm:
            run(convert_to_parquet("a.xlsx", "b.parquet"))
        self.assertIn("GRAFT_SPARK_SUBMIT", str(cm.exception))

    def test_missing_jar_override(self):
        os.environ["GRAFT_JAR"] = "/nonexistent/app.jar"
        with self.assertRaises(GraftToParquetError) as cm:
            run(convert_to_parquet("a.xlsx", "b.parquet"))
        self.assertIn("GRAFT_JAR", str(cm.exception))


class FailureWrappingTests(unittest.TestCase):
    """The wrapper must surface the CLI's `Error: ...` stderr line."""

    def setUp(self):
        self._env = dict(os.environ)
        self.dir = Path(tempfile.mkdtemp())
        fake = self.dir / "spark-submit"
        fake.write_text("#!/bin/sh\n"
                        "echo 'irrelevant log line' >&2\n"
                        "echo 'Error: Unsupported file extension for input: x.txt"
                        " (expected .xlsx or .xlsb)' >&2\n"
                        "exit 1\n")
        fake.chmod(0o755)
        jar = self.dir / "app.jar"
        jar.write_bytes(b"PK")
        os.environ["GRAFT_SPARK_SUBMIT"] = str(fake)
        os.environ["GRAFT_JAR"] = str(jar)

    def tearDown(self):
        os.environ.clear()
        os.environ.update(self._env)
        shutil.rmtree(self.dir, ignore_errors=True)

    def test_exit1_surfaces_error_line(self):
        with self.assertRaises(GraftToParquetError) as cm:
            run(convert_to_parquet("x.txt", "y.parquet"))
        msg = str(cm.exception)
        self.assertIn("exit code 1", msg)
        self.assertIn("Unsupported file extension", msg)
        self.assertNotIn("irrelevant log line", msg)


@unittest.skipUnless(os.environ.get("GRAFT_JAR"),
                     "end-to-end needs GRAFT_JAR (run via sbt PythonApiSpec)")
class EndToEndTests(unittest.TestCase):
    def setUp(self):
        self.dir = Path(tempfile.mkdtemp())

    def tearDown(self):
        shutil.rmtree(self.dir, ignore_errors=True)

    def test_happy_path_converts(self):
        src = self.dir / "in.xlsx"
        make_xlsx(src, n_rows=7)
        out = self.dir / "out.parquet"
        run(convert_to_parquet(str(src), str(out), batch_size=3))
        part_files = list(out.glob("*.parquet"))
        self.assertTrue(part_files, f"no parquet parts in {out}")

    def test_unsupported_extension_exits_1(self):
        src = self.dir / "in.txt"
        src.write_text("not a workbook")
        with self.assertRaises(GraftToParquetError) as cm:
            run(convert_to_parquet(str(src), str(self.dir / "out.parquet")))
        self.assertIn("Unsupported file extension", str(cm.exception))


if __name__ == "__main__":
    unittest.main(verbosity=2)
