"""The spark-submit artifact (dist/orc_rs_spark.zip) must match the tree.

jobs/package.py builds the --py-files zip that jobs/encode_job.py ships to
executors (README "Run as a spark-submit job"). The zip is gitignored, so
nothing else forces a rebuild after kernel changes — round 6 caught a zip
that predated kernels/lzo.py, which would have made a submitted job crash
on compression="lzo" while the in-tree tests stayed green. Rebuilding here
is idempotent and sub-second, and the byte-parity assertion means any
pytest run leaves a fresh artifact behind.
"""

import os
import zipfile

import jobs.package as package

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dist_zip_rebuilds_to_byte_parity_with_the_tree():
    package.main()
    zip_path = os.path.join(ROOT, "dist", "orc_rs_spark.zip")
    with zipfile.ZipFile(zip_path) as z:
        names = set(z.namelist())
        on_disk = {}
        pkg = os.path.join(ROOT, "orc_rs_spark")
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    on_disk[os.path.relpath(full, ROOT)] = full
        assert on_disk, "package tree unexpectedly empty"
        missing = set(on_disk) - names
        assert not missing, f"zip is missing package modules: {sorted(missing)}"
        extra = names - set(on_disk)
        assert not extra, f"zip carries files not in the tree: {sorted(extra)}"
        for rel, full in sorted(on_disk.items()):
            with open(full, "rb") as fh:
                assert z.read(rel) == fh.read(), f"zip entry {rel} is stale"
