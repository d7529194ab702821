"""Standard security handler: transparent decryption of encrypted PDFs.

From-scratch implementation of the PDF standard security handler per
ISO 32000-1 §7.6 / ISO 32000-2 §7.6.4.  Behavior-parity target in the
reference: ``class CipherTransformFactory``
(lib/pdf.js/v4.5.136/build/pdf.worker.js:40867) plus the PDF17/PDF20
password algorithms (:40725-40824):

- /V 1-2 (R 2-3): RC4 with the Algorithm-2 MD5 file key.
- /V 4 (R 4): crypt filters /CF with CFM V2 (RC4) or AESV2 (AES-128-CBC).
- /V 5 (R 5-6): AES-256-CBC; R5 via single SHA-256, R6 via the 2.B
  iterated SHA-256/384/512 hash.
- Empty user password (the very common permissions-only encryption) is
  tried first, then the empty owner password; anything needing a real
  password raises PDFError (the caller surfaces it as an error row, same
  as the reference's PasswordException path).

AES primitives come from the public `cryptography` package (import-gated);
RC4 prefers the same package's ARC4 with a pure-Python fallback.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

from .cos import Name, PDFError, StreamObj

try:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    try:  # ARC4 moved to the decrepit namespace in cryptography>=43
        from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4
    except ImportError:  # pragma: no cover
        ARC4 = getattr(algorithms, "ARC4", None)
    _HAVE_CRYPTO = True
except ImportError:  # pragma: no cover
    _HAVE_CRYPTO = False
    ARC4 = None

# ISO 32000-1 Algorithm 2 padding string (CipherTransformFactory
# #defaultPasswordBytes, pdf.worker.js:40868)
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric encrypt/decrypt)."""
    if _HAVE_CRYPTO and ARC4 is not None:
        return Cipher(ARC4(key), mode=None).encryptor().update(data)
    # pure-Python fallback
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _require_aes() -> None:
    if not _HAVE_CRYPTO:
        raise PDFError("AES-encrypted PDF but no AES backend available")


def aes_cbc_decrypt(key: bytes, data: bytes, iv: Optional[bytes] = None,
                    strip_padding: bool = True) -> bytes:
    """AES-CBC decrypt.  When ``iv`` is None the first 16 bytes of ``data``
    are the IV (the PDF stream/string layout).  Padding is stripped
    leniently (last-byte value 1..16), matching AESBaseCipher.decryptBlock."""
    _require_aes()
    if iv is None:
        if len(data) < 16:
            return b""
        iv, data = data[:16], data[16:]
    data = data[: len(data) - (len(data) % 16)]  # tolerate ragged tails
    if not data:
        return b""
    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    out = dec.update(data) + dec.finalize()
    if strip_padding and out:
        p = out[-1]
        if 1 <= p <= 16:
            out = out[:-p]
    return out


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """AES-CBC encrypt of already-padded data (no padding added)."""
    _require_aes()
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def aes_ecb_encrypt(key: bytes, data: bytes) -> bytes:
    """AES-ECB encrypt (used only for the R6 /Perms blob in fixtures)."""
    _require_aes()
    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return enc.update(data) + enc.finalize()


def _md5(b: bytes) -> bytes:
    return hashlib.md5(b).digest()


def _pdf20_hash(password: bytes, salt_input: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6) iterated hash (PDF20._hash,
    pdf.worker.js:40760-40791)."""
    k = hashlib.sha256(salt_input).digest()
    e = b"\x00"
    i = 0
    while i < 64 or e[-1] > i - 32:
        block = password + k + udata
        k1 = block * 64
        e = aes_cbc_encrypt(k[:16], k1, k[16:32])
        r = sum(e[:16]) % 3
        if r == 0:
            k = hashlib.sha256(e).digest()
        elif r == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
    return k[:32]


class SecurityHandler:
    """Decrypts strings and streams of one document.

    Built once per document from the resolved /Encrypt dictionary and the
    first element of the trailer /ID.  Tries the empty user password, then
    the empty owner password; raises PDFError if a real password is needed
    (parity: PasswordException NEED_PASSWORD, pdf.worker.js:41104-41106).
    """

    def __init__(self, enc: dict, id0: bytes, resolve: Callable):
        filt = resolve(enc.get("Filter"))
        if str(filt) != "Standard":
            raise PDFError(f"unsupported encryption filter {filt!r}")
        v = resolve(enc.get("V"))
        if v not in (1, 2, 4, 5):
            raise PDFError(f"unsupported encryption algorithm V={v!r}")
        self.v = v
        r = resolve(enc.get("R"))
        if not isinstance(r, int):
            raise PDFError("missing encryption revision /R")
        self.r = r
        self.encrypt_metadata = (
            v in (4, 5) and resolve(enc.get("EncryptMetadata")) is not False)

        o = resolve(enc.get("O")) or b""
        u = resolve(enc.get("U")) or b""
        p = resolve(enc.get("P"))
        p = p if isinstance(p, int) else -1

        # key length: /Length, else for V4 the StmF crypt filter's Length
        # (<<3 when given in bytes), default 40 / 128 (factory ctor logic)
        length = resolve(enc.get("Length"))
        self.cf: dict = {}
        self.stmf = "Identity"
        self.strf = "Identity"
        if v >= 4:
            cf = resolve(enc.get("CF"))
            if isinstance(cf, dict):
                self.cf = {str(k): resolve(vv) for k, vv in cf.items()}
            stmf = resolve(enc.get("StmF"))
            strf = resolve(enc.get("StrF"))
            self.stmf = str(stmf) if isinstance(stmf, (Name, str)) else "Identity"
            self.strf = str(strf) if isinstance(strf, (Name, str)) else "Identity"
        if not length:
            if v <= 3:
                length = 40
            else:
                handler = self.cf.get(self.stmf)
                length = 128
                if isinstance(handler, dict):
                    hl = resolve(handler.get("Length"))
                    if isinstance(hl, int) and hl:
                        length = hl << 3 if hl < 40 else hl
        if not isinstance(length, int) or length < 40 or length % 8:
            raise PDFError(f"invalid encryption key length {length!r}")

        if v != 5:
            key = self._prepare_key_data(id0, b"", o[:32], u[:32], p, r,
                                         length, self.encrypt_metadata)
        else:
            key = self._key_v5(o, u, resolve(enc.get("OE")) or b"",
                               resolve(enc.get("UE")) or b"")
        if key is None:
            raise PDFError("encrypted PDF requires a password")
        self.key = key

    # -- key derivation (V 1-4) -----------------------------------------
    @staticmethod
    def _prepare_key_data(id0: bytes, password: bytes, o32: bytes, u32: bytes,
                          p: int, r: int, length: int,
                          encrypt_metadata: bool) -> Optional[bytes]:
        """Algorithm 2 + user-password check (Algorithm 4/5); returns the
        file key or None (CipherTransformFactory.#prepareKeyData)."""
        buf = (password + PAD)[:32] + o32
        buf += (p & 0xFFFFFFFF).to_bytes(4, "little")
        buf += id0
        if r >= 4 and not encrypt_metadata:
            buf += b"\xff\xff\xff\xff"
        h = _md5(buf)
        klen = length >> 3
        if r >= 3:
            for _ in range(50):
                h = _md5(h[:klen])
        key = h[:klen]
        if r >= 3:
            check = rc4(key, _md5(PAD + id0))
            for j in range(1, 20):
                derived = bytes(b ^ j for b in key)
                check = rc4(derived, check)
            if u32[: len(check)] != check:
                return None
        else:
            if u32[:32] != rc4(key, PAD):
                return None
        return key

    # -- key derivation (V 5, R 5/6) ------------------------------------
    def _key_v5(self, o: bytes, u: bytes, oe: bytes, ue: bytes) -> Optional[bytes]:
        """PDF17 (R5) / PDF20 (R6) empty-password user-then-owner check
        (pdf.worker.js:40725-40824, #createEncryptionKey20)."""
        pwd = b""
        uv, uk = u[32:40], u[40:48]
        ov, ok = o[32:40], o[40:48]
        u48 = u[:48]
        if self.r == 6:
            def hash_(salt: bytes, udata: bytes) -> bytes:
                return _pdf20_hash(pwd, pwd + salt + udata, udata)
        else:
            def hash_(salt: bytes, udata: bytes) -> bytes:
                return hashlib.sha256(pwd + salt + udata).digest()
        if hash_(uv, b"") == u[:32]:
            ikey = hash_(uk, b"")
            return aes_cbc_decrypt(ikey, ue, iv=b"\x00" * 16, strip_padding=False)
        if hash_(ov, u48) == o[:32]:
            ikey = hash_(ok, u48)
            return aes_cbc_decrypt(ikey, oe, iv=b"\x00" * 16, strip_padding=False)
        return None

    # -- per-object ciphers ---------------------------------------------
    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        """Algorithm 1 per-object key (#buildObjectKey)."""
        buf = self.key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        if aes:
            buf += b"sAlT"
        return _md5(buf)[: min(len(self.key) + 5, 16)]

    def _apply(self, cf_name: str, num: int, gen: int, data: bytes) -> bytes:
        if self.v in (1, 2):
            return rc4(self._object_key(num, gen, aes=False), data)
        # V 4/5: crypt-filter dispatch (#buildCipherConstructor)
        if cf_name == "Identity":
            return data
        handler = self.cf.get(cf_name)
        cfm = str(handler.get("CFM", "None")) if isinstance(handler, dict) else "None"
        if cfm == "None":
            return data
        if cfm == "V2":
            return rc4(self._object_key(num, gen, aes=False), data)
        if cfm == "AESV2":
            return aes_cbc_decrypt(self._object_key(num, gen, aes=True), data)
        if cfm == "AESV3":
            return aes_cbc_decrypt(self.key, data)
        raise PDFError(f"unknown crypt filter method {cfm!r}")

    def _apply_safe(self, cf_name: str, num: int, gen: int, data: bytes) -> bytes:
        """PDFError contract: cipher-layer failures on corrupt key material
        (wrong AES key size, bogus CF dicts) never escape as other types."""
        try:
            return self._apply(cf_name, num, gen, data)
        except PDFError:
            raise
        except Exception as e:  # noqa: BLE001
            raise PDFError(f"decryption failed: {type(e).__name__}: {e}") from e

    def decrypt_string(self, num: int, gen: int, data: bytes) -> bytes:
        return self._apply_safe(self.strf, num, gen, data)

    def decrypt_stream(self, num: int, gen: int, data: bytes) -> bytes:
        return self._apply_safe(self.stmf, num, gen, data)

    def decrypt_object(self, obj, num: int, gen: int):
        """Recursively decrypt all strings in a fetched indirect object and
        arm stream decryption (applied before the /Filter chain).  Strings
        inside object streams are NOT re-decrypted (the container stream
        already was) — same rule as the reference parser."""
        if isinstance(obj, bytes):
            return self.decrypt_string(num, gen, obj)
        if isinstance(obj, list):
            return [self.decrypt_object(x, num, gen) for x in obj]
        if isinstance(obj, StreamObj):
            obj.dict = {k: self.decrypt_object(v, num, gen)
                        for k, v in obj.dict.items()}
            t = str(obj.dict.get("Type", ""))
            skip = (t == "XRef") or (t == "Metadata" and not self.encrypt_metadata)
            # NOTE: a /Crypt filter entry does NOT override StmF here —
            # the reference applies the StmF cipher to every stream
            # unconditionally (makeStream, pdf.worker.js:13843) and treats
            # "Crypt" as an unknown no-op filter, so a /Crypt Identity
            # plaintext stream decrypts to garbage and the page absorbs to
            # '' in BOTH engines (verified by differential fixture).  The
            # ISO-correct skip would diverge from the reference.
            if not skip:
                obj.crypt = lambda raw: self.decrypt_stream(num, gen, raw)
            return obj
        if isinstance(obj, dict):
            return {k: self.decrypt_object(v, num, gen) for k, v in obj.items()}
        return obj
