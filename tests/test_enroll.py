"""End-to-end `enroll` tests — the spec notebook's "Uniqueness" use case:
check each candidate against the live DB over the MPC protocol, append the
unique ones to the store (SPEC §6.1), reject duplicates — including a
duplicate of a candidate enrolled EARLIER IN THE SAME RUN (the sequential
correctness property; parties adopt appends via the sync hooks)."""

import asyncio
import json
import threading

import numpy as np
import pytest

from mpc_iris_tpu.cli import main, make_keyed_count_watcher
from mpc_iris_tpu.io.formats import open_masks, open_share
from mpc_iris_tpu.models import KeyedShareEngine
from mpc_iris_tpu.protocol import ParticipantServer
from mpc_iris_tpu.protocol.keyagree import read_key32
from mpc_iris_tpu.types import Template


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _start_participant_thread(engine, refresh):
    """Run a ParticipantServer on its own event loop in a daemon thread, so
    cli.main() (which owns the main thread's asyncio.run) can query it."""
    holder = {}
    ready = threading.Event()

    def run():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        server = ParticipantServer(engine, "127.0.0.1", 0, refresh=refresh)
        _, holder["port"] = loop.run_until_complete(server.start())
        holder["loop"] = loop
        ready.set()
        loop.run_forever()
        loop.run_until_complete(server.close())
        loop.close()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert ready.wait(120), "participant server failed to start"
    holder["thread"] = th
    return holder


def _stop_participant_thread(holder):
    holder["loop"].call_soon_threadsafe(holder["loop"].stop)
    holder["thread"].join(60)


def test_enroll_end_to_end(workdir, capsys):
    """2-party deployment: party 0 is KEYED (follows mpc.count), this
    process holds the data share (share-1) as a local engine. Candidates:
    a copy of an existing entry (duplicate), a fresh template (unique), and
    a rotation of that fresh template (duplicate of the just-enrolled
    entry — only caught if appends are adopted between queries)."""
    assert main(["generate", "db.json", "10", "--seed", "41"]) == 0
    assert main(["prepare", "db.json", "2", "mpc", "--insecure-seed", "7",
                 "--save-key", "mpc.key"]) == 0

    objs = json.loads((workdir / "db.json").read_bytes())
    fresh = Template.random(np.random.default_rng(77))
    cands = [objs[4], fresh.to_json_obj(), fresh.rotated(3).to_json_obj()]
    (workdir / "cands.json").write_text(json.dumps(cands))

    key = read_key32(str(workdir / "mpc.key"))
    eng = KeyedShareEngine(key, 0, count=10, chunk=4)
    holder = _start_participant_thread(
        eng, make_keyed_count_watcher(str(workdir / "mpc.count"), eng))
    try:
        rc = main(["enroll", "cands.json", "mpc",
                   f"127.0.0.1:{holder['port']}",
                   "--count", "2", "--key", "mpc.key",
                   "--threshold", "0.2", "--share", "mpc.share-1",
                   "--chunk", "4"])
    finally:
        _stop_participant_thread(holder)
    assert rc == 0

    out = capsys.readouterr().out.splitlines()
    verdicts = [l for l in out if l.startswith("candidate ")]
    assert len(verdicts) == 3
    assert "DUPLICATE of entry 4 at distance 0.0" in verdicts[0]
    assert "enrolled at index 10" in verdicts[1]
    assert "DUPLICATE of entry 10 at distance 0.0" in verdicts[2]

    # The store grew by exactly the one unique candidate, everywhere.
    assert open_masks("mpc.masks").shape[0] == 11
    assert open_share("mpc.share-0").shape[0] == 11  # local keyed file kept
    assert open_share("mpc.share-1").shape[0] == 11
    assert (workdir / "mpc.count").read_text().strip() == "11"

    # Reconstruction of the appended entry is exact (shares continue the
    # same keystreams: file decrypt == keyed decrypt at the grown count).
    assert main(["decrypt", "mpc.share-0", "mpc.share-1",
                 "--output", "dec.json"]) == 0
    dec = json.loads((workdir / "dec.json").read_bytes())
    assert len(dec) == 11
    got = Template.from_json_obj(dec[10])
    assert got.mask.data.tobytes() == fresh.mask.data.tobytes()
    assert np.array_equal(got.pattern.data & got.mask.data,
                          fresh.pattern.data & fresh.mask.data)
    assert main(["decrypt", "keyed:0:11:mpc.key", "mpc.share-1",
                 "--output", "dec2.json"]) == 0
    assert (workdir / "dec.json").read_bytes() == \
        (workdir / "dec2.json").read_bytes()


def test_enroll_batched_matches_sequential_semantics(workdir, capsys):
    """Batched wire: one MPC round for the whole candidate set, with
    within-round duplicates caught by the kept-candidate cross-check —
    verdicts must equal the sequential path's."""
    assert main(["generate", "db.json", "8", "--seed", "45"]) == 0
    assert main(["prepare", "db.json", "2", "mpc", "--insecure-seed", "3",
                 "--save-key", "mpc.key"]) == 0

    objs = json.loads((workdir / "db.json").read_bytes())
    f1 = Template.random(np.random.default_rng(91))
    f2 = Template.random(np.random.default_rng(92))
    cands = [objs[2],                 # duplicate of an existing entry
             f1.to_json_obj(),        # unique
             f1.rotated(-7).to_json_obj(),  # duplicate of f1, SAME round
             f2.to_json_obj()]        # unique
    (workdir / "cands.json").write_text(json.dumps(cands))

    key = read_key32(str(workdir / "mpc.key"))
    eng = KeyedShareEngine(key, 0, count=8, chunk=4)
    holder = _start_participant_thread_batched(
        eng, make_keyed_count_watcher(str(workdir / "mpc.count"), eng))
    try:
        rc = main(["enroll", "cands.json", "mpc",
                   f"127.0.0.1:{holder['port']}",
                   "--count", "2", "--key", "mpc.key",
                   "--threshold", "0.2", "--share", "mpc.share-1",
                   "--chunk", "4", "--wire", "batched", "--round", "4"])
    finally:
        _stop_participant_thread(holder)
    assert rc == 0

    out = capsys.readouterr().out.splitlines()
    verdicts = [l for l in out if l.startswith("candidate ")]
    assert len(verdicts) == 4
    assert "DUPLICATE of entry 2 at distance 0.0" in verdicts[0]
    assert "enrolled at index 8" in verdicts[1]
    assert "DUPLICATE of entry 8 at distance 0.0" in verdicts[2]
    assert "enrolled at index 9" in verdicts[3]
    assert open_masks("mpc.masks").shape[0] == 10
    assert (workdir / "mpc.count").read_text().strip() == "10"


def _start_participant_thread_batched(engine, refresh):
    holder = {}
    ready = threading.Event()

    def run():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        server = ParticipantServer(engine, "127.0.0.1", 0, wire="batched",
                                   refresh=refresh)
        _, holder["port"] = loop.run_until_complete(server.start())
        holder["loop"] = loop
        ready.set()
        loop.run_forever()
        loop.run_until_complete(server.close())
        loop.close()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert ready.wait(120), "participant server failed to start"
    holder["thread"] = th
    return holder


def test_enroll_validation(workdir):
    assert main(["generate", "db.json", "4", "--seed", "42"]) == 0
    assert main(["prepare", "db.json", "2", "mpc", "--insecure-seed", "7",
                 "--save-key", "mpc.key"]) == 0
    # missing store
    assert main(["enroll", "db.json", "nope", "--count", "2",
                 "--key", "mpc.key", "--threshold", "0.3"]) == 1
    # wrong (smaller) share count than the store was built with
    assert main(["generate", "db3.json", "4", "--seed", "43"]) == 0
    assert main(["prepare", "db3.json", "3", "mpc3", "--insecure-seed", "7",
                 "--save-key", "mpc3.key"]) == 0
    assert main(["enroll", "db.json", "mpc3", "--count", "2",
                 "--key", "mpc3.key", "--threshold", "0.3"]) == 1
    # missing key file
    assert main(["enroll", "db.json", "mpc", "--count", "2",
                 "--key", "nope.key", "--threshold", "0.3"]) == 1
    # no participants and no --share: coordinator refuses masks-only
    assert main(["enroll", "db.json", "mpc", "--count", "2",
                 "--key", "mpc.key", "--threshold", "0.3"]) == 1
