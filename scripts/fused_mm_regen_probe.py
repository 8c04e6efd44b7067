"""Probe MATRIX for the fused ChaCha-regen + matmul kernel question.

VERDICT r04 weak #1 / next #2: the keyed share path runs at ~88% of its own
resident roofline because the serial tail regen (VPU) cannot overlap the MXU
matmuls, and the evidence that a fused Mosaic kernel cannot fix it was
scattered anecdotes. This runner closes the question REPRODUCIBLY: it drives
every kernel family we designed for the problem —

  xla             whole-K int8 dot_general through XLA (the baseline the
                  engine actually uses; scripts/mm_ktile_probe.py --variant xla)
  wholek-pallas   whole-K (12,800) dot_general inside a Pallas kernel
                  (scripts/mm_probe.py result: Mosaic SIGABRT at EVERY tile)
  grid-k          K as a revisited-accumulator grid axis
                  (scripts/mm_ktile_probe.py --variant grid-k)
  slab            whole-K VMEM operands, static K-slab accumulation loop
                  (scripts/mm_ktile_probe.py --variant slab)
  fused-serial    full ChaCha regen into VMEM scratch at m==0, then the two
                  share matmuls in-kernel (scripts/fused_regen_probe.py)
  fused-pipe      double-buffered variant regenerating tile i+1 during tile
                  i's matmul steps (scripts/fused_regen_probe.py --interleave)

— one SUBPROCESS per config (a Mosaic SIGABRT must never take down the
matrix), polling `scripts/tpu_poll.py` back to health after every failure
(CLAUDE.md wedge protocol), and commits the outcome table to
``docs/FUSED_REGEN_MATRIX.json``.

Known-SIGABRT configs are SKIPPED by default (status carried from their
recorded round-4 runs) because repeated Mosaic aborts wedge the remote
compile service for an hour+; pass ``--full`` to re-demonstrate them (at
most one abort per family is re-run even then).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/fused_mm_regen_probe.py
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "docs", "FUSED_REGEN_MATRIX.json")

PY = sys.executable

# Each config: id, argv (relative to repo root), expect ("ok" = should
# compile and report a rate; "sigabrt" = known remote-compile abort, skipped
# unless --full), note (what the config decides).
CONFIGS = [
    # --- baseline: what the shipped engine path achieves through XLA
    dict(id="xla/whole-K", expect="ok",
         argv=[PY, "scripts/mm_ktile_probe.py", "--variant", "xla"],
         note="XLA int8 dot_general baseline at the probe shape "
              "(M=1984, N=32768, K=12800)"),
    # --- whole-K inside Pallas: the direct fusion prerequisite. Mosaic
    #     SIGABRTs at every tile size tried (r04; scripts/mm_probe.py) — the
    #     'remote_compile HTTP 500 SIGABRT' class from CLAUDE.md.
    dict(id="wholek-pallas", expect="sigabrt",
         argv=[PY, "scripts/mm_probe.py"],
         note="whole-K dot_general in-kernel (mm_probe.py's Pallas "
              "section); aborts the remote Mosaic compiler (r04, every "
              "tile size tried)"),
    # --- K-tiled accumulating kernels (the standard workarounds)
    dict(id="grid-k/m256-n256-k3200", expect="ok",
         argv=[PY, "scripts/mm_ktile_probe.py", "--variant", "grid-k",
               "--tile-m", "256", "--tile-n", "256", "--tile-k", "3200"],
         note="K as revisited-accumulator grid axis — the per-step "
              "re-visited output block collapses the Mosaic pipeline"),
    dict(id="grid-k/m496-n512-k3200", expect="ok",
         argv=[PY, "scripts/mm_ktile_probe.py", "--variant", "grid-k",
               "--tile-m", "496", "--tile-n", "512", "--tile-k", "3200"],
         note="larger N tile, M tile matching the fused kernel's"),
    dict(id="slab/m256-n256-k3200", expect="ok",
         argv=[PY, "scripts/mm_ktile_probe.py", "--variant", "slab",
               "--tile-m", "256", "--tile-n", "256", "--tile-k", "3200"],
         note="whole-K VMEM operands + static slab accumulation (the "
              "in-kernel matmul style the fused kernel uses)"),
    dict(id="slab/m496-n1024-k3200", expect="ok",
         argv=[PY, "scripts/mm_ktile_probe.py", "--variant", "slab",
               "--tile-m", "496", "--tile-n", "1024", "--tile-k", "3200"],
         note="the fused kernel's MN tile, matmul only (tile_k must be a "
              "multiple of 128 here: the slab loop's dynamic dslice offset "
              "needs a provable 128 alignment, so 1600 only works in the "
              "fused kernel's statically unrolled slabs)"),
    # --- the fused regen+matmul kernel itself (bit-exact in interpret mode;
    #     tests cover correctness — these runs measure the rate ceiling)
    dict(id="fused-serial/B64-n512", expect="ok",
         argv=[PY, "scripts/fused_regen_probe.py", "--batch", "64",
               "--rows", "8192", "--tile-m", "496", "--tile-n", "512",
               "--tile-k", "1600", "--vmem-mb", "96"],
         note="serial: regen n-tile at m==0, then matmul steps"),
    dict(id="fused-serial/B64-n1024", expect="ok",
         argv=[PY, "scripts/fused_regen_probe.py", "--batch", "64",
               "--rows", "8192", "--tile-m", "496", "--tile-n", "1024",
               "--tile-k", "1600", "--vmem-mb", "96"],
         note="serial, deeper n-tile (fewer regen entries per matmul step)"),
    dict(id="fused-serial/B256-n1024", expect="ok",
         argv=[PY, "scripts/fused_regen_probe.py", "--batch", "256",
               "--rows", "8192", "--tile-m", "496", "--tile-n", "1024",
               "--tile-k", "1600", "--vmem-mb", "96"],
         note="serial at the best-measured batch (more m-steps amortize "
              "each tile's regen)"),
    dict(id="fused-pipe/B64-n512", expect="ok",
         argv=[PY, "scripts/fused_regen_probe.py", "--batch", "64",
               "--rows", "8192", "--tile-m", "496", "--tile-n", "512",
               "--tile-k", "1600", "--vmem-mb", "96", "--interleave"],
         note="software-pipelined: regen tile i+1 during tile i's matmuls "
              "(double-buffered scratch)"),
    dict(id="fused-pipe/B64-n1024", expect="ok",
         argv=[PY, "scripts/fused_regen_probe.py", "--batch", "64",
               "--rows", "8192", "--tile-m", "496", "--tile-n", "1024",
               "--tile-k", "1600", "--vmem-mb", "96", "--interleave",
               "--regen-rows", "256"],
         note="pipelined, deeper n-tile (regen_rows 256: the pipeline "
              "spreads n_sub=tile_n/regen_rows subtile regens over the 4 "
              "m-steps)"),
    dict(id="fused-pipe/B256-n1024", expect="ok",
         argv=[PY, "scripts/fused_regen_probe.py", "--batch", "256",
               "--rows", "8192", "--tile-m", "496", "--tile-n", "1024",
               "--tile-k", "1600", "--vmem-mb", "96", "--interleave"],
         note="pipelined at the best-measured batch"),
]

RATE_RE = re.compile(r"(\d+)\s*TMAC/s")


def poll_healthy(max_wait=3600):
    """Wait until a fresh tiny compile answers quickly TWICE (CLAUDE.md)."""
    ok = 0
    t0 = time.monotonic()
    while ok < 2 and time.monotonic() - t0 < max_wait:
        r = subprocess.run(
            [PY, os.path.join(HERE, "tpu_poll.py")], capture_output=True,
            text=True, timeout=900,
        )
        m = re.search(r"round trip ([0-9.]+)s", r.stdout + r.stderr)
        if r.returncode == 0 and m and float(m.group(1)) < 10.0:
            ok += 1
        else:
            ok = 0
            time.sleep(30)
    return ok == 2


def run_config(cfg, timeout):
    t0 = time.monotonic()
    try:
        proc = subprocess.run(cfg["argv"], cwd=REPO, capture_output=True,
                              text=True, timeout=timeout)
        tail = (proc.stdout + proc.stderr)[-1500:]
        rate = None
        m = RATE_RE.search(proc.stdout)
        if m:
            rate = int(m.group(1))
        if proc.returncode == 0 and rate is not None:
            outcome = "ok"
        elif "SIGABRT" in tail or "500" in tail:
            outcome = "sigabrt-remote-compile"
        else:
            outcome = f"failed-rc{proc.returncode}"
        return dict(outcome=outcome, rate_tmacs=rate,
                    wall_s=round(time.monotonic() - t0, 1),
                    tail=tail if outcome != "ok" else None)
    except subprocess.TimeoutExpired:
        return dict(outcome="timeout", rate_tmacs=None,
                    wall_s=round(time.monotonic() - t0, 1), tail=None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also re-run known-SIGABRT configs (wedge risk)")
    ap.add_argument("--only", default=None, help="substring filter on id")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    prior = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = {e["id"]: e for e in json.load(f)["configs"]}

    results = []
    for cfg in CONFIGS:
        if args.only and args.only not in cfg["id"]:
            if cfg["id"] in prior:
                results.append(prior[cfg["id"]])
            continue
        entry = dict(id=cfg["id"], argv=cfg["argv"][1:], note=cfg["note"],
                     expect=cfg["expect"])
        if cfg["expect"] == "sigabrt" and not args.full:
            carried = prior.get(cfg["id"], {})
            entry.update(
                outcome=carried.get("outcome", "sigabrt-remote-compile"),
                rate_tmacs=None,
                status="recorded-r04-not-rerun (aborts wedge the remote "
                       "compile service; --full re-demonstrates)",
            )
            print(f"[skip ] {cfg['id']}: known SIGABRT (recorded)", flush=True)
        else:
            print(f"[run  ] {cfg['id']} ...", flush=True)
            entry.update(run_config(cfg, args.timeout))
            entry["status"] = "measured"
            print(f"[done ] {cfg['id']}: {entry['outcome']}"
                  + (f" {entry['rate_tmacs']} TMAC/s"
                     if entry.get("rate_tmacs") else ""), flush=True)
            if entry["outcome"] != "ok":
                print("[poll ] waiting for remote compile service health...",
                      flush=True)
                if not poll_healthy():
                    print("service did not recover; aborting the matrix",
                          file=sys.stderr)
                    break
        results.append(entry)

    doc = {
        "question": "can a fused ChaCha-regen+matmul Mosaic kernel beat the "
                    "engine's separate-stage design (keyed 1M >= 7.3e9)?",
        "verdict": "no on this toolchain — see DESIGN.md 6.1; this matrix "
                   "is the reproducible evidence",
        "date": time.strftime("%Y-%m-%d"),
        "configs": results,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"\nwrote {OUT}")
    for e in results:
        rate = f"{e.get('rate_tmacs') or '-':>5}"
        print(f"  {e['id']:<28} {e['outcome']:<24} {rate} TMAC/s")


if __name__ == "__main__":
    main()
