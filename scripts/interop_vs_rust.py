"""Cross-implementation interop checks against a BUILT Rust reference binary.

Driven by scripts/interop_vs_rust.sh (which builds the binary and skips
cleanly where cargo is absent). Every check is byte- or value-exact:

1. ``prepare`` parity: both implementations prepare the SAME JSON dump; the
   masks files must be byte-identical (shares differ by RNG, by design).
2. ``decrypt`` of rust-prepared shares: our reader reconstructs the rust
   share files back to the original planes (pattern-under-mask + mask).
3. Wire direction A (rust serves, we query): a rust ``participant`` on a
   rust-prepared share answers our raw 3,200-byte template with an
   N x 62-byte record stream BYTE-IDENTICAL to our ShareEngine's records
   over the same share file.
4. Wire direction B (we serve, rust queries): the rust ``coordinator`` runs
   a query round against OUR participant protocol implementation over an
   our-prepared 1-party store; the (index, distance) it prints must equal
   our oracle's decode for the CAPTURED query — f64-exact (Rust Display
   prints shortest-roundtrip, so parsing it back gives the identical bits).

Reference behaviors exercised: src/main.rs:268-383 (prepare),
386-452 (participant), 453-644 (coordinator), json_stream.rs, bits.rs
byte layout, encoded_bits.rs Pod layout, lib.rs decode.
"""

import argparse
import asyncio
import os
import re
import signal
import socket
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DB = 48
SEED = 7


def log(*a):
    print("[interop]", *a, flush=True)


def run_ours(argv):
    from mpc_iris_tpu.cli import main

    rc = main([str(a) for a in argv])
    if rc != 0:
        raise SystemExit(f"our CLI failed: {argv} -> rc {rc}")


def wait_port(port, deadline=60.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < deadline:
        with socket.socket() as s:
            try:
                s.connect(("127.0.0.1", port))
                return
            except OSError:
                time.sleep(0.2)
    raise SystemExit(f"port {port} never opened")


def check_prepare_and_decrypt(rust_bin, work):
    log("1/4 prepare parity + 2/4 decrypt of rust shares")
    run_ours(["generate", f"{work}/db.json", str(N_DB), "--seed", str(SEED)])
    run_ours(["prepare", f"{work}/db.json", "2", f"{work}/ours"])
    subprocess.run(
        [rust_bin, "prepare", f"{work}/db.json", "2", f"{work}/rust"],
        check=True, cwd=work,
    )
    ours_masks = open(f"{work}/ours.masks", "rb").read()
    rust_masks = open(f"{work}/rust.masks", "rb").read()
    assert ours_masks == rust_masks, (
        f"masks differ: ours {len(ours_masks)}B vs rust {len(rust_masks)}B"
    )
    log(f"   masks byte-identical ({len(ours_masks)} bytes)")

    run_ours(["decrypt", f"{work}/rust.share-0", f"{work}/rust.share-1",
              "--output", f"{work}/dec.json"])
    from mpc_iris_tpu.native import parse_templates_stream

    def planes(path):
        ps, ms = [], []
        with open(path, "rb") as f:
            for p, m in parse_templates_stream(f):
                ps.append(p)
                ms.append(m)
        return np.concatenate(ps), np.concatenate(ms)

    p0, m0 = planes(f"{work}/db.json")
    p1, m1 = planes(f"{work}/dec.json")
    assert np.array_equal(m0, m1), "decrypted masks differ from input"
    assert np.array_equal(p0 & m0, p1 & m1), "patterns differ under mask"
    assert not np.any(p1 & ~m1), "decrypt leaked bits outside the mask"
    log("   our decrypt reconstructs rust-prepared shares exactly")


def check_wire_rust_serves(rust_bin, work, port=19991):
    log("3/4 wire A: rust participant serves a query WE send")
    proc = subprocess.Popen(
        [rust_bin, "participant", f"{work}/rust.share-0",
         f"127.0.0.1:{port}"],
        cwd=work, stderr=subprocess.DEVNULL,
    )
    try:
        wait_port(port)
        from mpc_iris_tpu.io.formats import open_share
        from mpc_iris_tpu.io.json_stream import iter_json_array
        from mpc_iris_tpu.models import ShareEngine
        from mpc_iris_tpu.protocol.wire import records_to_bytes
        from mpc_iris_tpu.types import Template

        with open(f"{work}/db.json", "rb") as f:
            query = Template.from_json_obj(next(iter(iter_json_array(f))))
        with socket.create_connection(("127.0.0.1", port), timeout=120) as s:
            s.sendall(query.to_bytes())
            want_len = N_DB * 62
            got = b""
            while len(got) < want_len:
                b = s.recv(1 << 20)
                if not b:
                    break
                got += b
        assert len(got) == want_len, f"rust reply {len(got)}B != {want_len}B"
        eng = ShareEngine(np.asarray(open_share(f"{work}/rust.share-0")),
                          chunk=16)
        qp = query.to_bytes()
        ours = records_to_bytes(
            eng.dots(np.frombuffer(qp[:1600], np.uint8)[None],
                     np.frombuffer(qp[1600:], np.uint8)[None])[0]
        )
        assert got == ours, "rust reply records != our engine's records"
        log(f"   {want_len} reply bytes byte-identical to our engine")
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def check_wire_rust_queries(rust_bin, work, port=19992):
    log("4/4 wire B: rust coordinator drives OUR participant")
    run_ours(["prepare", f"{work}/db.json", "1", f"{work}/solo"])

    captured = {}

    async def serve_one():
        from mpc_iris_tpu.io.formats import open_share
        from mpc_iris_tpu.models import ShareEngine
        from mpc_iris_tpu.protocol import ParticipantServer

        eng = ShareEngine(np.asarray(open_share(f"{work}/solo.share-0")),
                          chunk=16)

        class Capturing:
            count = eng.count

            def stream(self, qp, qm, entry_major=False):
                captured["qp"], captured["qm"] = qp, qm
                yield from eng.stream(qp, qm, entry_major=entry_major)

        server = ParticipantServer(Capturing(), "127.0.0.1", port)
        await server.start()

        proc = await asyncio.create_subprocess_exec(
            rust_bin, "coordinator", "--masks", f"{work}/solo.masks",
            f"127.0.0.1:{port}",
            cwd=work, stderr=asyncio.subprocess.PIPE,
        )
        line_re = re.compile(
            r"Found closest entry at (\d+) out of (\d+) at distance (\S+)\.")
        found = None
        try:
            deadline = asyncio.get_running_loop().time() + 300
            while True:
                budget = deadline - asyncio.get_running_loop().time()
                raw = await asyncio.wait_for(proc.stderr.readline(), budget)
                if not raw:
                    raise SystemExit("rust coordinator exited early")
                m = line_re.search(raw.decode(errors="replace"))
                if m:
                    found = (int(m.group(1)), int(m.group(2)), m.group(3))
                    break
        finally:
            # The reference loop runs forever by design (main.rs:449 TODO);
            # one completed query is the test. Kill the exact child we spawned.
            proc.send_signal(signal.SIGKILL)
            await proc.wait()
            await server.close()
        return found

    idx, total, dist_str = asyncio.run(serve_one())
    assert total == N_DB, f"rust scanned {total} != {N_DB}"

    # Oracle for the CAPTURED query: numerator records are the solo share's
    # dots (1 party = full encoding); decode exactly like the reference.
    from mpc_iris_tpu.io.formats import open_masks, open_share
    from mpc_iris_tpu.models import MasksEngine, ShareEngine
    from mpc_iris_tpu.ops.decode import decode_distance_batch_np

    qp, qm = captured["qp"], captured["qm"]
    dots = ShareEngine(np.asarray(open_share(f"{work}/solo.share-0")),
                       chunk=16).dots(qp, qm)[0]
    dens = MasksEngine(np.asarray(open_masks(f"{work}/solo.masks")),
                       chunk=16).dots(qm)[0]
    dists = decode_distance_batch_np(dots, dens)
    want_idx = int(np.argmin(dists))
    want_dist = float(dists[want_idx])
    got_dist = float(dist_str)  # shortest-roundtrip parse: exact f64
    assert idx == want_idx, f"rust argmin {idx} != ours {want_idx}"
    assert got_dist == want_dist, (
        f"rust distance {got_dist!r} != ours {want_dist!r}"
    )
    log(f"   rust printed ({idx}, {dist_str}) == our oracle, f64-exact")


def main():
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--rust-bin", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--json-out", default=None,
                    help="also write the one-line JSON verdict to this path "
                    "(stdout always gets it; for CI artifact collection)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    work = args.workdir

    checks = [
        ("prepare-parity+decrypt", check_prepare_and_decrypt),
        ("wire-rust-serves", check_wire_rust_serves),
        ("wire-rust-queries", check_wire_rust_queries),
    ]
    results = []
    failed = None
    for name, fn in checks:
        try:
            fn(args.rust_bin, work)
            results.append({"name": name, "ok": True})
        except (Exception, SystemExit) as e:  # SystemExit carries the detail
            results.append({"name": name, "ok": False, "error": str(e)})
            failed = name
            break
    verdict = {
        "gate": "interop_vs_rust",
        "status": "FAIL" if failed else "PASS",
        "checks": results,
        "reference": os.environ.get("MPC_IRIS_REFERENCE", "/root/reference"),
        "date": time.strftime("%Y-%m-%d"),
    }
    line = json.dumps(verdict, sort_keys=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    print(line, flush=True)
    if failed:
        raise SystemExit(1)
    log("ALL INTEROP CHECKS PASSED")


if __name__ == "__main__":
    main()
