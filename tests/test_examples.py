"""The examples are product surface: run the library-API walkthrough small.

examples/api_demo.py asserts exact (bit-identical) parity at every step —
plaintext engine vs scalar oracle, MPC reconstruction vs plaintext, keyed vs
file-backed serving, re-randomization invariance — so executing it IS the
test; this just shrinks the sizes to suite scale.
"""

import importlib.util
import pathlib


def test_api_demo_small():
    path = pathlib.Path(__file__).resolve().parent.parent / "examples" / "api_demo.py"
    spec = importlib.util.spec_from_file_location("api_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # Smallest sizes the engines accept (chunk floor 128) — multi-chunk scans
    # are covered by the engine tests; the demo's checks raise (not bare
    # assert), so this works under `python -O` too.
    mod.N_DB, mod.B, mod.CHUNK = 128, 2, 128
    mod.main()
