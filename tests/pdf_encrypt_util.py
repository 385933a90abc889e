"""Independent-producer PDF encryptor for security-handler fixtures.

Encrypts a pdfgen-produced PDF with the standard security handler
(RC4-40 / RC4-128 / AES-128 crypt filters / AES-256 R6), empty user
password, per ISO 32000 algorithms 1-13 — implemented HERE from the spec
with hashlib + the `cryptography` library, while the C++ engine implements
the DECRYPT side with hand-rolled primitives (raster/cpp/crypt.h).  Two
unrelated implementations meeting in the middle is the same layered
validation the suite uses for JBIG2/JPX (a shared bug cannot produce a
pixel-identical round trip).

Only handles the object shapes pdfgen emits (classic xref, direct
/Length, literal or Flate streams) — it is a test fixture producer, not a
general PDF rewriter.
"""

from __future__ import annotations

import hashlib
import re
import struct
from pathlib import Path

from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    enc = Cipher(ARC4(key), mode=None).encryptor()
    return enc.update(data) + enc.finalize()


def _aes_cbc_enc(key: bytes, iv: bytes, data: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def _pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def _file_key_r234(user_pw: bytes, o_entry: bytes, p: int, id0: bytes,
                   r: int, n: int) -> bytes:
    h = hashlib.md5()
    h.update(_pad_pw(user_pw))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    digest = h.digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:n]).digest()
    return digest[:n]


def _o_entry(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    digest = hashlib.md5(_pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:n]
    out = _rc4(key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            out = _rc4(bytes(b ^ i for b in key), out)
    return out


def _u_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    if r == 2:
        return _rc4(file_key, PAD)
    u = hashlib.md5(PAD + id0).digest()
    u = _rc4(file_key, u)
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16  # padded to 32 bytes


def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 password hash)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    e = b"\x00"
    while i < 64 or e[-1] > i - 32:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_enc(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
    return k[:32]


def _obj_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


class _Cryptor:
    """Per-method string/stream encryption closure."""

    def __init__(self, method: str, seed: bytes = b"fixture-seed"):
        self.method = method
        self._ctr = 0
        self._seed = seed

    def _iv(self) -> bytes:
        # Deterministic fixture IVs (tests must be reproducible); IV
        # uniqueness, not unpredictability, is what decryption exercises.
        self._ctr += 1
        return hashlib.md5(self._seed + self._ctr.to_bytes(4, "big")).digest()

    def encrypt(self, file_key: bytes, num: int, gen: int, data: bytes) -> bytes:
        if self.method in ("rc4-40", "rc4-128"):
            return _rc4(_obj_key(file_key, num, gen, aes=False), data)
        if self.method == "aes-128":
            key = _obj_key(file_key, num, gen, aes=True)
        elif self.method == "aes-256":
            key = file_key
        else:
            raise ValueError(self.method)
        iv = self._iv()
        padlen = 16 - len(data) % 16
        return iv + _aes_cbc_enc(key, iv, data + bytes([padlen]) * padlen)


def _parse_objects(data: bytes):
    """(num, body) pairs from a pdfgen-style PDF; body excludes obj/endobj."""
    objs = []
    pos = 0
    pat = re.compile(rb"(\d+) 0 obj\n", re.S)
    while True:
        m = pat.search(data, pos)
        if not m:
            break
        start = m.end()
        # Streams: trust /Length (pdfgen writes it directly) to skip the
        # payload so binary content cannot fake an 'endobj'.  The stream
        # keyword must belong to THIS object (precede its own endobj).
        naive_end = data.index(b"endobj", start)
        head = data[start:naive_end]
        sm = re.search(rb"stream\n", head)
        lm = re.search(rb"/Length (\d+)", head)
        if sm and lm and lm.start() < sm.start():
            payload_start = start + sm.end()
            payload_end = payload_start + int(lm.group(1))
            end = data.index(b"endobj", payload_end)
        else:
            end = naive_end
        body = data[start:end].rstrip(b"\n")
        objs.append((int(m.group(1)), body))
        pos = end + 6
    return objs


def _transform_body(body: bytes, enc_one) -> bytes:
    """Encrypt the stream payload and every literal string in `body`."""
    sm = re.search(rb"stream\n", body)
    if sm:
        dict_part = body[: sm.start()]
        payload = body[sm.end():]
        payload = re.sub(rb"\nendstream$", b"", payload)
        ct = enc_one(payload, is_stream=True)
        dict_part = re.sub(
            rb"/Length \d+", b"/Length %d" % len(ct), dict_part, count=1
        )
        return dict_part + b"stream\n" + ct + b"\nendstream"

    def repl(m):
        ct = enc_one(m.group(1), is_stream=False)
        return b"<" + ct.hex().encode() + b">"

    # pdfgen strings contain no escapes in the objects we re-emit here;
    # encrypted strings are re-emitted as hex so arbitrary bytes stay valid.
    return re.sub(rb"\(([^()\\]*)\)", repl, body)


def encrypt_pdf(src, dst, method: str = "rc4-128", owner_pw: bytes = b"own3r"):
    """Rewrite the pdfgen PDF at `src` as an encrypted twin at `dst`.

    method: rc4-40 | rc4-128 | aes-128 | aes-256.  User password empty.
    """
    data = Path(src).read_bytes()
    objs = _parse_objects(data)
    id0 = hashlib.md5(data + method.encode()).digest()
    enc_num = max(n for n, _ in objs) + 1

    p_flags = -44  # print/copy allowed, modify denied: a realistic mask
    if method == "rc4-40":
        v, r, n = 1, 2, 5
        o = _o_entry(owner_pw, b"", r, n)
        key = _file_key_r234(b"", o, p_flags, id0, r, n)
        u = _u_entry(key, id0, r)
        enc_dict = (
            b"<< /Filter /Standard /V 1 /R 2 /Length 40 /P %d "
            b"/O <%s> /U <%s> >>"
            % (p_flags, o.hex().encode(), u.hex().encode())
        )
    elif method == "rc4-128":
        v, r, n = 2, 3, 16
        o = _o_entry(owner_pw, b"", r, n)
        key = _file_key_r234(b"", o, p_flags, id0, r, n)
        u = _u_entry(key, id0, r)
        enc_dict = (
            b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P %d "
            b"/O <%s> /U <%s> >>"
            % (p_flags, o.hex().encode(), u.hex().encode())
        )
    elif method == "aes-128":
        v, r, n = 4, 4, 16
        o = _o_entry(owner_pw, b"", r, n)
        key = _file_key_r234(b"", o, p_flags, id0, r, n)
        u = _u_entry(key, id0, r)
        enc_dict = (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d "
            b"/O <%s> /U <%s> "
            b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            b"/StmF /StdCF /StrF /StdCF >>"
            % (p_flags, o.hex().encode(), u.hex().encode())
        )
    elif method == "aes-256":
        v, r = 5, 6
        key = hashlib.sha256(b"fixture-file-key" + id0).digest()  # 32 bytes
        uvs = hashlib.md5(b"uvs" + id0).digest()[:8]
        uks = hashlib.md5(b"uks" + id0).digest()[:8]
        u = _hash_2b(b"", uvs, b"") + uvs + uks
        ue = _aes_cbc_enc(_hash_2b(b"", uks, b""), b"\x00" * 16, key)
        ovs = hashlib.md5(b"ovs" + id0).digest()[:8]
        oks = hashlib.md5(b"oks" + id0).digest()[:8]
        o = _hash_2b(owner_pw, ovs, u) + ovs + oks
        oe = _aes_cbc_enc(_hash_2b(owner_pw, oks, u), b"\x00" * 16, key)
        perms = struct.pack("<i", p_flags) + b"\xff" * 4 + b"Tadb" + b"\x00" * 4
        perms_ct = Cipher(
            algorithms.AES(key), modes.ECB()
        ).encryptor().update(perms)
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d "
            b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> "
            b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF >>"
            % (p_flags, o.hex().encode(), u.hex().encode(),
               oe.hex().encode(), ue.hex().encode(), perms_ct.hex().encode())
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    cryptor = _Cryptor(method)
    out = bytearray(b"%PDF-1.7\n%\xc7\xec\x8f\xa2\n")
    offsets = {}
    for num, body in objs:
        def enc_one(payload, is_stream, _num=num):
            return cryptor.encrypt(key, _num, 0, payload)

        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += _transform_body(body, enc_one)
        out += b"\nendobj\n"
    offsets[enc_num] = len(out)
    out += b"%d 0 obj\n" % enc_num + enc_dict + b"\nendobj\n"

    xref_pos = len(out)
    n_obj = enc_num
    out += b"xref\n0 %d\n" % (n_obj + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj + 1):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Encrypt %d 0 R "
        b"/ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_obj + 1, enc_num, id0.hex().encode(), id0.hex().encode(),
           xref_pos)
    )
    Path(dst).write_bytes(bytes(out))
    return Path(dst)
