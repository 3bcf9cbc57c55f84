"""Offline contract tests for hatch_build.stage_jar (stdlib only).

The wheel build itself needs hatchling (not available offline), so
these tests pin the staging contract the hook implements: copy the
newest sbt jar into graft_to_parquet/jar/ and force-include every
staged jar — including the sdist case where no sbt output exists.
"""
import os
import sys
import tempfile
import time
import unittest
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from hatch_build import stage_jar  # noqa: E402


def make_layout(tmp, sbt_jars=()):
    """repo/python_lib + repo/target/scala-2.13 with the given jars."""
    repo = Path(tmp) / "repo"
    root = repo / "python_lib"
    (root / "graft_to_parquet").mkdir(parents=True)
    out = repo / "target" / "scala-2.13"
    out.mkdir(parents=True)
    for i, name in enumerate(sbt_jars):
        p = out / name
        p.write_bytes(b"jar" + bytes([i]))
        # distinct mtimes so "newest" is well-defined
        t = time.time() - len(sbt_jars) + i
        os.utime(p, (t, t))
    return root


class StageJarTest(unittest.TestCase):

    def test_stages_newest_jar_and_force_includes_it(self):
        with tempfile.TemporaryDirectory() as tmp:
            root = make_layout(tmp, ["graft_2.13-0.1.jar", "graft_2.13-0.2.jar"])
            build_data = {}
            n = stage_jar(root, build_data)
            self.assertEqual(n, 1)
            staged = root / "graft_to_parquet" / "jar" / "graft_2.13-0.2.jar"
            self.assertTrue(staged.exists())
            self.assertEqual(
                build_data["force_include"][str(staged)],
                "graft_to_parquet/jar/graft_2.13-0.2.jar")

    def test_sdist_case_reuses_pre_staged_jar(self):
        with tempfile.TemporaryDirectory() as tmp:
            root = make_layout(tmp)  # no sbt output
            pre = root / "graft_to_parquet" / "jar" / "graft_2.13-0.1.jar"
            pre.parent.mkdir(parents=True)
            pre.write_bytes(b"jar")
            build_data = {"force_include": {}}
            n = stage_jar(root, build_data)
            self.assertEqual(n, 1)
            self.assertIn(str(pre), build_data["force_include"])

    def test_nothing_to_stage_is_zero_not_an_error(self):
        with tempfile.TemporaryDirectory() as tmp:
            root = make_layout(tmp)
            self.assertEqual(stage_jar(root, {}), 0)


if __name__ == "__main__":
    unittest.main()
