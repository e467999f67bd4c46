"""spark-submit --py-files ship path (north rule, BASELINE.json:14).

Packages the library into a zip, then launches the crawl job through a
real ``spark-submit`` subprocess with ONLY the zip on --py-files (cwd
moved elsewhere so the job cannot fall back to the repo checkout).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_debug_echoes_config_without_spark():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "submit_crawl.py"),
         "--seed", "http://h0.test/p/0", "--debug"],
        capture_output=True, text=True, check=True,
        env=dict(os.environ, PYTHONPATH=REPO))
    cfg = json.loads(out.stdout)
    # reference --debug prints config and runs nothing (cli.py:55-59)
    assert cfg["user_agent"] == "PySimpleCrawler"
    assert cfg["obey_robots"] is True and cfg["trim_query"] is True


@pytest.mark.slow
def test_spark_submit_pyfiles_zip(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package_pyfiles

    zip_path = package_pyfiles.build(str(tmp_path / "simplecrawler_spark.zip"))
    job = str(tmp_path / "submit_crawl.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_crawl.py"), job)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path, job,
         "--any-authority",
         "--pages", "400", "--hosts", "4", "--max-rounds", "4",
         "--root", str(tmp_path / "ckpt")],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["urls_done"] > 0 and res["rounds"] >= 1


@pytest.mark.slow
def test_spark_submit_transcript_lines(tmp_path):
    """S7 CLI sink: --transcript echoes the reference-style
    CRAWLING:/VISITED:/FOUND: lines (crawler.py:147-179) from the
    crawl_log table after the run."""
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         os.path.join(REPO, "scripts", "submit_crawl.py"),
         "--any-authority", "--transcript",
         "--pages", "120", "--hosts", "2", "--max-rounds", "3",
         "--root", str(tmp_path / "ckpt")],
        capture_output=True, text=True, cwd=str(tmp_path),
        env=dict(env, PYTHONPATH=REPO), timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    lines = out.stdout.splitlines()
    assert any(l.startswith("CRAWLING: ") for l in lines)
    assert any(l.startswith("VISITED: ") for l in lines)
    assert any(l.startswith("FOUND: ") and " ON " in l for l in lines)
    crawling = {l.split(": ", 1)[1] for l in lines
                if l.startswith("CRAWLING: ")}
    visited = {l.split(": ", 1)[1] for l in lines
               if l.startswith("VISITED: ")}
    assert visited <= crawling
