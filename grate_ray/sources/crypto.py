"""Standard/basic RC4 "obfuscation" for legacy containers — S10.

A real implementation of the MS-OFFCRYPTO 2.3.6 basic-RC4 scheme the
reference uses to decrypt password-protected .xls workbooks
(/root/reference/xls/crypto/crypto.go:81-103, crypto/rc4.go:13-155):

- 52-byte FilePass payload: ``major u16 | minor u16 (must be 1) |
  salt[16] | encryptedVerifier[16] | encryptedVerifierHash[16]``
  (``basicRC4Encryption``, crypto.go:73-79).
- Std97 key derivation (``generateStd97Key``, rc4.go:131-155):
  ``H0 = md5(utf16le(password))``; ``Hfinal = md5((H0[:5]+salt) x 16)``.
- Per-block rekey every 1024 bytes (``startBlock``, rc4.go:117-128):
  ``block_key = md5(Hfinal[:5] + le32(block))``; the block counter
  resets to zero at the start of every stream.
- Verification (rc4.go:99-114): decrypt verifier then verifierHash with
  ONE continuing block-0 keystream; ``md5(verifier) == verifierHash``.
- Default password ``VelvetSweatshop`` (crypto.go:62-68).

RC4 itself is the textbook KSA+PRGA cipher (Python has no stdlib RC4).
Encryption == decryption (XOR keystream), so the same code synthesizes
encrypted fixtures. In the engine this runs as a payload-decryption step
inside the container-extraction ``map_batches`` stage
(``pipelines/container.py``) — key material is derived once per
container and cached per actor (ST1), never per batch.

Pure-Python PRGA throughput is ~10 MB/s/core — fine for the framed
payload sizes this engine ships (a stream decrypts once at ingest);
a 100 TB deployment would swap ``_RC4.crypt`` for a C kernel behind the
same interface.
"""

from __future__ import annotations

import hashlib
import struct

DEFAULT_PASSWORD = "VelvetSweatshop"
BLOCK = 1024


class BadFilePass(Exception):
    """FilePass payload malformed (wrong size / minor version)."""


class VerifyFailed(Exception):
    """Password verification failed (wrong password or corrupt salt)."""


class _RC4:
    """Textbook RC4: key-scheduling + pseudo-random generation."""

    def __init__(self, key: bytes):
        s = list(range(256))
        j = 0
        for i in range(256):
            j = (j + s[i] + key[i % len(key)]) & 0xFF
            s[i], s[j] = s[j], s[i]
        self._s = s
        self._i = 0
        self._j = 0

    def crypt(self, data: bytes) -> bytes:
        s, i, j = self._s, self._i, self._j
        out = bytearray(len(data))
        for k, c in enumerate(data):
            i = (i + 1) & 0xFF
            j = (j + s[i]) & 0xFF
            s[i], s[j] = s[j], s[i]
            out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
        self._i, self._j = i, j
        return bytes(out)


def derive_std97_key(password: str, salt: bytes) -> bytes:
    """Hfinal per MS-OFFCRYPTO 2.3.6.2 (rc4.go:131-155)."""
    if not password or len(salt) != 16:
        raise ValueError("invalid keygen material")
    h0 = hashlib.md5(password.encode("utf-16-le")).digest()
    m = hashlib.md5()
    for _ in range(16):
        m.update(h0[:5])
        m.update(salt)
    return m.digest()


def _block_cipher(hfinal: bytes, block: int) -> _RC4:
    """Per-1024-byte-block cipher (startBlock, rc4.go:117-128)."""
    key = hashlib.md5(hfinal[:5] + struct.pack("<I", block)).digest()
    return _RC4(key)


def crypt_stream(hfinal: bytes, data: bytes) -> bytes:
    """En/decrypt one stream: block counter starts at 0 per stream and
    increments at each 1024-byte boundary (Write/Flush, rc4.go:13-59).
    Symmetric — used both to build fixtures and to ingest them."""
    out = bytearray()
    for block in range(0, -(-len(data) // BLOCK) or 1):
        chunk = data[block * BLOCK : (block + 1) * BLOCK]
        out += _block_cipher(hfinal, block).crypt(chunk)
    return bytes(out)


class BasicRC4:
    """Parsed 52-byte FilePass payload + verify/decrypt surface
    (NewBasicRC4, crypto.go:81-103)."""

    def __init__(self, payload: bytes):
        if len(payload) != 52:
            raise BadFilePass(
                f"data length is invalid (expected 52 bytes, got {len(payload)})"
            )
        major, minor = struct.unpack_from("<HH", payload, 0)
        if minor != 1:
            raise BadFilePass(f"unknown basic-RC4 minor version {minor}")
        self.major = major
        self.salt = payload[4:20]
        self.everifier = payload[20:36]
        self.everifier_hash = payload[36:52]

    def verify(self, password: str = DEFAULT_PASSWORD) -> bytes:
        """Check the password; returns Hfinal for stream decryption.
        One continuing block-0 keystream decrypts verifier THEN hash
        (Verify, rc4.go:99-114)."""
        hfinal = derive_std97_key(password, self.salt)
        dec = _block_cipher(hfinal, 0)
        verifier = dec.crypt(self.everifier)
        vhash = dec.crypt(self.everifier_hash)
        if hashlib.md5(verifier).digest() != vhash:
            raise VerifyFailed("verification failed")
        return hfinal


def make_filepass(
    password: str = DEFAULT_PASSWORD,
    salt: bytes = b"\x5a" * 16,
    verifier: bytes = b"\xa5" * 16,
) -> bytes:
    """Build a valid 52-byte FilePass payload (fixture side; the
    reference only consumes these). Deterministic for fixed inputs."""
    if len(salt) != 16 or len(verifier) != 16:
        raise ValueError("salt/verifier must be 16 bytes")
    hfinal = derive_std97_key(password, salt)
    enc = _block_cipher(hfinal, 0)
    ev = enc.crypt(verifier)
    evh = enc.crypt(hashlib.md5(verifier).digest())
    return struct.pack("<HH", 1, 1) + salt + ev + evh
