"""Literal kill/restart resumability: a build process killed mid-flight
leaves valid per-partition checkpoints; the rerun completes the index
and matches a clean build (BASELINE.md resumability criterion)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest


BUILD_SNIPPET = """
import sys, ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR", _temp_dir={tmp!r})
sys.path.insert(0, {repo!r})
from iresearch_ray.index.build import build_index
build_index({corpus!r}, {idx!r}, segment_docs=256, concurrency=1)
ray.shutdown()
"""


def test_kill_restart_resumes(tmp_path, ray_session):
    from iresearch_ray.data.transcripts import write_transcripts
    from iresearch_ray.index.build import build_index
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.search import filters as F
    from iresearch_ray.search.searcher import IndexSearcher

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = str(tmp_path / "corpus")
    write_transcripts(corpus, n_parts=4, convs_per_part=64)
    idx_killed = str(tmp_path / "killed")
    idx_clean = str(tmp_path / "clean")

    # run a build in a subprocess and kill it once some segments exist
    ray_tmp = str(tmp_path / "raytmp")
    code = BUILD_SNIPPET.format(repo=repo, corpus=corpus, idx=idx_killed,
                                tmp=ray_tmp)
    # start_new_session: the subprocess's ray.init(address="local")
    # spawns raylet/worker children in ITS process group — killing only
    # the driver leaves orphaned encoder actors that keep writing
    # segments and race the resumed build (observed flake). Kill the
    # whole group.
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True)
    deadline = time.time() + 120
    killed_mid_flight = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — resume is then a no-op
        # ".tmp." excludes the pre-rename staging dirs: they carry a
        # _SUCCESS for an instant before the atomic rename, and a kill
        # in that window would otherwise count a segment as done that
        # the resume (correctly) re-encodes — failing the reuse assert
        done = [d for d in os.listdir(idx_killed)
                if d.startswith("seg-") and ".tmp." not in d and
                os.path.exists(os.path.join(idx_killed, d, "_SUCCESS"))] \
            if os.path.isdir(idx_killed) else []
        if len(done) >= 2:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            killed_mid_flight = True
            break
        time.sleep(0.1)
    else:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            proc.kill()
        proc.wait()

    # belt and braces: wait until nothing is still mutating the index
    # dir (a surviving worker's in-flight segment write settles or dies)
    def _dir_state():
        if not os.path.isdir(idx_killed):
            return ()
        out = []
        for root, _, files in os.walk(idx_killed):
            for f in files:
                p = os.path.join(root, f)
                try:
                    st = os.stat(p)
                    out.append((p, st.st_size, st.st_mtime_ns))
                except OSError:
                    pass
        return tuple(sorted(out))

    # kill any surviving workers of the dead driver's Ray session (a
    # raylet may setpgrp its workers out of the driver's process group;
    # observed in-suite flake: an orphan kept appending segments while
    # the resumed build ran). The subprocess session got a private
    # _temp_dir, so its raylet/workers carry that path in their cmdline
    # — enumerate those PIDs from /proc and WAIT until every one is
    # gone (a pkill + fixed sleep raced under full-suite load).
    def _session_pids():
        # NOTE: actor workers rewrite their title via setproctitle
        # ("ray::SegmentEncoder"), which REPLACES /proc/pid/cmdline —
        # a cmdline-only scan misses exactly the orphaned encoder
        # actors that keep writing segments (the in-suite flake). Their
        # open fds (logs, sockets) still point into the private session
        # dir, so scan those too.
        pids = []
        needle = ray_tmp.encode()
        needle_s = ray_tmp
        me = os.getpid()
        for p in os.listdir("/proc"):
            if not p.isdigit() or int(p) == me:
                continue
            try:
                with open(f"/proc/{p}/cmdline", "rb") as f:
                    cmd = f.read()
            except OSError:
                continue
            if needle in cmd:
                pids.append(int(p))
                continue
            fd_dir = f"/proc/{p}/fd"
            try:
                fds = os.listdir(fd_dir)
            except OSError:
                continue
            for fd in fds:
                try:
                    tgt = os.readlink(os.path.join(fd_dir, fd))
                except OSError:
                    continue
                if needle_s in tgt:
                    pids.append(int(p))
                    break
        return pids

    kill_deadline = time.time() + 60
    while time.time() < kill_deadline:
        pids = _session_pids()
        if not pids:
            break
        for pid in pids:
            try:
                os.kill(pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        time.sleep(0.2)
    else:
        pytest.skip(f"orphan Ray workers would not die: {_session_pids()}")

    # belt and braces: one settle check now that no writer can be alive
    prev = _dir_state()
    settle_deadline = time.time() + 10
    while time.time() < settle_deadline:
        time.sleep(0.5)
        cur = _dir_state()
        if cur == prev:
            break
        prev = cur

    pre = {d for d in os.listdir(idx_killed)
           if d.startswith("seg-") and ".tmp." not in d and
           os.path.exists(os.path.join(idx_killed, d, "_SUCCESS"))} \
        if os.path.isdir(idx_killed) else set()

    # restart (same session is fine — build_index skips finished segments)
    man = build_index(corpus, idx_killed, segment_docs=256, concurrency=1)
    build_index(corpus, idx_clean, segment_docs=256, concurrency=1)

    s_resumed = IndexSearcher(idx_killed)
    s_clean = IndexSearcher(idx_clean)
    layout = {
        "resumed": [(m["name"], m["doc_base"], m["docs_count"],
                     tuple(m["first_key"]), tuple(m["last_key"]))
                    for m in s_resumed.manifest.segments],
        "clean": [(m["name"], m["doc_base"], m["docs_count"],
                   tuple(m["first_key"]), tuple(m["last_key"]))
                  for m in s_clean.manifest.segments],
        "killed_mid_flight": killed_mid_flight,
        "pre_kill_segments": sorted(pre),
    }
    assert s_resumed.manifest.total_docs == s_clean.manifest.total_docs, layout
    for flt in [F.Term("ref"), F.Phrase(["deploy", "target"]), F.Prefix("sec")]:
        a = s_resumed.search(flt, k=20, mode="all")
        b = s_clean.search(flt, k=20, mode="all")
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), (flt, layout)
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   b["score"].to_numpy(), rtol=1e-6)
    if killed_mid_flight and pre:
        # checkpointed segments were reused, not rebuilt
        final = {m["name"] for m in man.segments}
        assert pre & final


BUILD_ROLLING = """
import sys, ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, {repo!r})
from iresearch_ray.index.build import build_index
build_index({corpus!r}, {idx!r}, segment_docs=256, concurrency=1, commit_every=2)
ray.shutdown()
"""


def test_rolling_commits_queryable_mid_build(tmp_path, ray_session):
    """VERDICT r1 #10: a long build with commit_every publishes
    consistent intermediate generations — a build killed mid-flight
    leaves a QUERYABLE index (not just resumable checkpoints)."""
    from iresearch_ray.data.transcripts import write_transcripts
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.search import filters as F
    from iresearch_ray.search.searcher import IndexSearcher

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = str(tmp_path / "rcorpus")
    write_transcripts(corpus, n_parts=4, convs_per_part=64)
    idx = str(tmp_path / "rolling")

    code = BUILD_ROLLING.format(repo=repo, corpus=corpus, idx=idx)
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 120
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break
        if os.path.isdir(idx) and os.path.exists(os.path.join(idx, "manifest.json")):
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            killed = True
            break
        time.sleep(0.05)
    else:
        proc.kill()
        proc.wait()

    assert Manifest.exists(idx), "no intermediate generation was published"
    man = Manifest.load(idx)
    s = IndexSearcher(idx)
    res = s.search(F.Term("the"), k=5)
    if killed:
        # mid-build snapshot: some but not necessarily all docs
        assert man.total_docs > 0
    assert len(res) > 0
