"""Build hook: bundle the sbt-packaged application jar into the wheel.

The packaging analogue of the reference's per-platform binary bundling
(/root/reference/python_lib/hatch_build.py:1-58): the reference stages
`data-to-parquet-*` Rust binaries from an external `dist/` into the
package's `bin/` and force-includes them; we stage the `sbt package`
jar from `../target/scala-2.13/` into `graft_to_parquet/jar/` and
force-include it. One jar serves every platform (the JVM is the
platform boundary), so there is no per-target matrix.

Scenario A (building from the repo): the jar is copied in from the sbt
output. Scenario B (building from an sdist, no sbt output around): a
jar already staged under `graft_to_parquet/jar/` is force-included
as-is.

The staging logic lives in `stage_jar`, a plain function with no
hatchling dependency, so the contract is unit-testable offline
(tests/test_build_hook.py); the thin hook class below is what
hatchling's `[tool.hatch.build.hooks.custom]` loads at wheel-build
time.
"""
import shutil
from pathlib import Path


def stage_jar(root, build_data):
    """Stage the newest sbt jar into <root>/graft_to_parquet/jar and
    record every staged jar in build_data['force_include'].

    Returns the number of jars force-included. `root` is the
    python_lib directory (the directory holding pyproject.toml).
    """
    root = Path(root)
    sbt_out = root.parent / "target" / "scala-2.13"
    pkg_jar_dir = root / "graft_to_parquet" / "jar"
    pkg_jar_dir.mkdir(parents=True, exist_ok=True)

    build_data.setdefault("force_include", {})

    # Scenario A: building from local source — sbt output is present
    jars = sorted(sbt_out.glob("*.jar"), key=lambda p: p.stat().st_mtime) \
        if sbt_out.exists() else []
    if jars:
        newest = jars[-1]
        shutil.copy2(newest, pkg_jar_dir / newest.name)

    # Final step: force-include whatever is staged (covers both the
    # just-copied jar and a pre-staged jar from an sdist)
    count = 0
    for item in sorted(pkg_jar_dir.iterdir()):
        if item.is_file() and item.suffix == ".jar":
            build_data["force_include"][str(item)] = \
                f"graft_to_parquet/jar/{item.name}"
            count += 1
    return count


try:  # pragma: no cover - import only exists inside a hatch build
    from hatchling.builders.hooks.plugin.interface import BuildHookInterface

    class CustomBuildHook(BuildHookInterface):
        def initialize(self, version, build_data):
            count = stage_jar(self.root, build_data)
            print(f"[hatch_build] force_include set for {count} jar(s)")
except ImportError:  # imported by the offline unit test
    pass
