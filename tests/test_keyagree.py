"""X25519 pairwise key agreement (protocol/keyagree.py) — the "DH" half of
the reference spec's re-randomization sketch (specification.ipynb "Iriscode
SMPC v1" future work; no reference code exists).

Pins: the X25519 exchange against the RFC 7748 §6.1 known-answer vector, the
HKDF step against an independent hashlib/hmac implementation, symmetry and
domain separation of derive_pair_key, and the CLI flow keygen -> pair-key ->
rerandomize --pair J:@keyfile with reconstruction invariance.
"""

import hashlib
import hmac
import os

import pytest

from mpc_iris_tpu.cli import main
from mpc_iris_tpu.protocol import keyagree

pytestmark = pytest.mark.skipif(
    not keyagree.have_crypto(), reason="cryptography package not installed"
)


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _write_identity(path, priv_hex):
    with open(path, "w") as f:
        f.write(priv_hex + "\n")


# RFC 7748 section 6.1 test vector.
ALICE_PRIV = "77076d0a7318a57d3c16c17251b26645df4c2f87ebc0992ab177fba51db92c2a"
ALICE_PUB = "8520f0098930a754748b7ddcb43ef75a0dbf3a0d26381af4eba4a98eaa9b4e6a"
BOB_PRIV = "5dab087e624a8a4b79e17f8b83800ee66f3bb1292618b6fd1c2f8b27ff88e0eb"
BOB_PUB = "de9edb7d7b7dc1b4d35b61c2ece435373f8343c85b78674dadfc7e146f882b4f"
SHARED = "4a5d9d5ba4ce2de1728e3bf480350f25e07e21c947d19e3376f09b3c1e161742"


def _hkdf_sha256(ikm: bytes, salt: bytes, info: bytes, length: int = 32) -> bytes:
    """Independent RFC 5869 HKDF (hashlib/hmac only) to cross-check the
    cryptography-library derivation in keyagree."""
    prk = hmac.new(salt, ikm, hashlib.sha256).digest()
    okm, t = b"", b""
    i = 1
    while len(okm) < length:
        t = hmac.new(prk, t + info + bytes([i]), hashlib.sha256).digest()
        okm += t
        i += 1
    return okm[:length]


def test_rfc7748_vector_and_independent_hkdf(workdir):
    """derive_pair_key == HKDF(RFC 7748 shared secret) computed from scratch
    with hashlib — pins both primitives and the salt/info construction."""
    _write_identity("alice.id", ALICE_PRIV)
    assert keyagree.load_identity_public("alice.id").hex() == ALICE_PUB

    got = keyagree.derive_pair_key("alice.id", bytes.fromhex(BOB_PUB),
                                  context=b"round-7")
    a, b = sorted((bytes.fromhex(ALICE_PUB), bytes.fromhex(BOB_PUB)))
    want = _hkdf_sha256(bytes.fromhex(SHARED), salt=a + b,
                        info=b"mpc-iris-tpu/pair-key/v1/round-7")
    assert got == want


def test_symmetry_and_domain_separation(workdir):
    _write_identity("alice.id", ALICE_PRIV)
    _write_identity("bob.id", BOB_PRIV)
    k_ab = keyagree.derive_pair_key("alice.id", bytes.fromhex(BOB_PUB))
    k_ba = keyagree.derive_pair_key("bob.id", bytes.fromhex(ALICE_PUB))
    assert k_ab == k_ba  # both sides derive the same pair key
    assert keyagree.derive_pair_key("alice.id", bytes.fromhex(BOB_PUB),
                                    context=b"epoch2") != k_ab
    # a different peer yields an unrelated key
    pub_c = keyagree.generate_identity("carol.id")
    assert keyagree.derive_pair_key("alice.id", pub_c) != k_ab
    with pytest.raises(ValueError, match="own public key"):
        keyagree.derive_pair_key("alice.id", bytes.fromhex(ALICE_PUB))


def test_generate_identity_modes_and_refuses_overwrite(workdir):
    pub = keyagree.generate_identity("me.id")
    assert (workdir / "me.id").exists()
    assert os.stat(workdir / "me.id").st_mode & 0o777 == 0o600
    assert keyagree.parse_public(str(workdir / "me.id.pub")) == pub
    assert keyagree.load_identity_public("me.id") == pub
    with pytest.raises(FileExistsError):
        keyagree.generate_identity("me.id")


def test_cli_keygen_pairkey_rerandomize_flow(workdir, capsys):
    """Full operator flow: each party keygens, exchanges .pub files, derives
    the SAME pair key, and rerandomizes with it — shares change on disk,
    reconstruction is invariant."""
    assert main(["generate", "db.json", "8", "--seed", "4"]) == 0
    assert main(["prepare", "db.json", "2", "mpc", "--insecure-seed", "6"]) == 0
    assert main(["decrypt", "mpc.share-0", "mpc.share-1",
                 "--output", "before.json"]) == 0

    assert main(["keygen", "p0.id"]) == 0
    pub0 = capsys.readouterr().out.strip()
    assert main(["keygen", "p1.id"]) == 0
    pub1 = capsys.readouterr().out.strip()
    assert len(bytes.fromhex(pub0)) == 32

    # Party 0 derives via --out keyfile; party 1 prints the hex-int form.
    assert main(["pair-key", "p0.id", "p1.id.pub", "--context", "r1",
                 "--out", "k01.hex"]) == 0
    capsys.readouterr()
    assert main(["pair-key", "p1.id", pub0, "--context", "r1"]) == 0
    key_int_form = capsys.readouterr().out.strip()
    # Both forms decode to the same 32 bytes (keyfile hex = byte order;
    # printed form = little-endian integer, matching --pair J:KEY parsing).
    key_bytes = bytes.fromhex((workdir / "k01.hex").read_text().strip())
    assert int(key_int_form, 0).to_bytes(32, "little") == key_bytes
    assert os.stat(workdir / "k01.hex").st_mode & 0o777 == 0o600

    before0 = (workdir / "mpc.share-0").read_bytes()
    assert main(["rerandomize", "mpc.share-0", "--index", "0",
                 "--pair", "1:@k01.hex"]) == 0
    assert main(["rerandomize", "mpc.share-1", "--index", "1",
                 "--pair", f"0:{key_int_form}"]) == 0
    assert (workdir / "mpc.share-0").read_bytes() != before0
    assert main(["decrypt", "mpc.share-0", "mpc.share-1",
                 "--output", "after.json"]) == 0
    assert (workdir / "before.json").read_bytes() == \
        (workdir / "after.json").read_bytes()


def test_mismatched_context_breaks_reconstruction(workdir):
    """Different --context labels on the two sides derive different keys, so
    the refresh noise does NOT cancel — guards against silently mixing
    epochs."""
    assert main(["generate", "db.json", "4", "--seed", "9"]) == 0
    assert main(["prepare", "db.json", "2", "mpc", "--insecure-seed", "2"]) == 0
    assert main(["decrypt", "mpc.share-0", "mpc.share-1",
                 "--output", "before.json"]) == 0
    _write_identity("p0.id", ALICE_PRIV)
    _write_identity("p1.id", BOB_PRIV)
    k0 = keyagree.derive_pair_key("p0.id", bytes.fromhex(BOB_PUB), b"a")
    k1 = keyagree.derive_pair_key("p1.id", bytes.fromhex(ALICE_PUB), b"b")
    assert main(["rerandomize", "mpc.share-0", "--index", "0",
                 "--pair", f"1:0x{int.from_bytes(k0, 'little'):064x}"]) == 0
    assert main(["rerandomize", "mpc.share-1", "--index", "1",
                 "--pair", f"0:0x{int.from_bytes(k1, 'little'):064x}"]) == 0
    assert main(["decrypt", "mpc.share-0", "mpc.share-1",
                 "--output", "after.json"]) == 0
    assert (workdir / "before.json").read_bytes() != \
        (workdir / "after.json").read_bytes()


def test_read_key32_accepts_both_printed_forms(tmp_path):
    """Regression: `pair-key` PRINTS the 0x little-endian-integer form but
    --out WRITES byte-order hex; a printed key hand-copied into a keyfile
    must decode to the same 32 bytes, not their byte-reversal."""
    from mpc_iris_tpu.protocol.keyagree import read_key32

    key = bytes(range(1, 33))
    f_bytes = tmp_path / "bytes.hex"
    f_bytes.write_text(key.hex() + "\n")
    f_int = tmp_path / "printed.hex"
    f_int.write_text(f"0x{int.from_bytes(key, 'little'):064x}\n")
    assert read_key32(str(f_bytes)) == key
    assert read_key32(str(f_int)) == key
    f_big = tmp_path / "big.hex"
    f_big.write_text(f"0x{1 << 256:x}\n")
    with pytest.raises(ValueError):
        read_key32(str(f_big))
