"""CLI smoke: put / search / dump / consolidate via subprocess (the CLI
owns its own Ray session, so it must work from a cold process)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    from iresearch_ray.data.transcripts import write_transcripts

    root = tmp_path_factory.mktemp("cli")
    corpus = str(root / "corpus")
    write_transcripts(corpus, n_parts=2, convs_per_part=32)
    idx = str(root / "idx")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    return corpus, idx, env


def run_cli(env, *args):
    out = subprocess.run(
        [sys.executable, "-m", "iresearch_ray.cli", *args],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cli_put_search_dump_consolidate(cli_env):
    corpus, idx, env = cli_env
    run_cli(env, "put", "--input", corpus, "--index", idx,
            "--segment-docs", "256")
    out = run_cli(env, "search", "--index", idx, "--query", "deploy",
                  "--k", "5")
    assert "doc_id" in out or "score" in out
    out = run_cli(env, "dump", "--index", idx)
    head = json.loads(out.strip().splitlines()[0])  # one JSON line per unit
    assert head["segments"] >= 1 and head["total_docs"] > 0
    run_cli(env, "consolidate", "--index", idx)
    out2 = run_cli(env, "search", "--index", idx, "--query",
                   '"deploy target"', "--k", "3")
    assert out2.strip()
