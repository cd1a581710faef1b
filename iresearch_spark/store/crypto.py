"""Index encryption at rest (S9) — AES-256-GCM over every content-bearing
column of every table the store persists, including build/merge staging
checkpoints (they survive crashes, so they are at-rest data too).

Mirrors the reference's directory-level encryption hook ([up]
core/utils/encryption.hpp :: encryption / ctr_encryption — a cipher owned
by the directory, applied to every file the codecs write), re-expressed
for a columnar store: instead of wrapping byte streams, each table kind
declares WHICH columns carry corpus content (term strings, posting blobs,
urls, stored values, tombstone masks, staged token arrays) and those
columns are encrypted cell-wise with Spark's builtin `aes_encrypt` /
`aes_decrypt` — JVM-side, whole-stage-codegen, never a Python round trip.
Structural metadata (seg_id, docIDs, df/cf counts, lengths, offsets'
byte sizes) stays plaintext, exactly like Parquet modular encryption's
plaintext-footer mode: sizes and counts leak, content does not.

Scale/pushdown tradeoff (documented, inherent): ciphertext parquet
min/max stats are meaningless, so the term-dictionary's sorted block-skip
(S7) does not prune on encrypted stores — every dictionary row group is
read and decrypted before the term predicate applies. The reference pays
the same shape of cost (encrypted blocks must be decrypted before its
FST/postings use them); its advantage is locality, ours is that decrypt
stays inside codegen. All query semantics, maintenance and streaming
paths are unchanged: readers decrypt at load, so the engine only ever
sees plaintext frames.

Key handling: callers pass raw 16/24/32-byte AES keys (or derive one from
a passphrase via `derive_key`). The snapshot manifest records the cipher
name plus a key-check value (sha256 of a fixed tag + key, truncated) so a
reader without the key — or with the wrong key — fails fast at open with
a clear error instead of an executor-side GCM tag failure. GCM's random
96-bit IV (prepended per cell by Spark) makes every write fresh;
authentication means on-disk tampering surfaces as AES_CRYPTO_ERROR.

On a real cluster the key should arrive via the cluster's secret
mechanism (spark.conf / credential provider); transient shuffle spill is
covered by `spark.io.encryption.enabled` — both out of scope for the
store layer itself.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

CIPHER_NAME = "aes-gcm"
_KCV_TAG = b"iresearch-spark-kcv|"
_MODE = "GCM"

# Per-table-kind treatment of content-bearing columns. Kinds absent from a
# row, or columns absent from a frame, are skipped — the same spec serves
# full tables and projections.
#   str  : UTF-8 string cell        -> binary ciphertext
#   ts   : timestamp cell           -> ciphertext of unix-micros decimal
#   bin  : binary cell              -> binary ciphertext
#   json : array cell (typed below) -> ciphertext of its JSON encoding
KIND_SPECS: dict[str, dict] = {
    "docs": {"str": ("url", "lang"), "ts": ("warc_ts",)},
    "postings": {
        "str": ("term",),
        "bin": (
            "blob", "skip", "bmax", "pos_off", "pos_pay",
            "span_off", "span_pay", "pay_off", "pay_pay",
        ),
    },
    "norms": {"bin": ("dls_bin",)},
    "masks": {"bin": ("mask_bin",)},
    # build stage-1 checkpoint: token/text content rides terms + pchars
    # (payload code points); int arrays (tf/position/offset counts) are
    # structural.
    "assigned": {
        "str": ("url", "lang"),
        "ts": ("warc_ts",),
        "json": {"terms": "array<string>", "pchars": "array<int>"},
    },
    # merge staging (survivors + remap tables share the doc columns)
    "survivors": {"str": ("url", "lang"), "ts": ("warc_ts",)},
}


def derive_key(passphrase: str | bytes) -> bytes:
    """A 32-byte AES key from a passphrase (sha256). For convenience in
    tests/CLI; production keys should come from a real secret store."""
    if isinstance(passphrase, str):
        passphrase = passphrase.encode("utf-8")
    return hashlib.sha256(b"iresearch-spark-key|" + passphrase).digest()


class IndexCipher:
    """Column-level AES-GCM codec for one index key."""

    def __init__(self, key: bytes | str):
        if isinstance(key, str):
            key = key.encode("utf-8")
        if not isinstance(key, (bytes, bytearray)) or len(key) not in (16, 24, 32):
            raise ValueError(
                "index key must be 16, 24 or 32 bytes (raw AES key); use "
                "derive_key(passphrase) to build one from a passphrase"
            )
        self.key = bytes(key)

    @property
    def kcv(self) -> str:
        """Key-check value recorded in the manifest: detects a missing or
        wrong key at open time without revealing the key (a fixed-tag
        sha256, truncated — the classic KCV role)."""
        return hashlib.sha256(_KCV_TAG + self.key).hexdigest()[:32]

    def describe(self) -> dict:
        return {"name": CIPHER_NAME, "kcv": self.kcv}

    # ------------------------------------------------------------ columns

    def _k(self):
        return F.lit(self.key)

    def _enc(self, col):
        return F.aes_encrypt(col, self._k(), F.lit(_MODE))

    def _dec(self, col):
        return F.aes_decrypt(col, self._k(), F.lit(_MODE))

    def encrypt_df(
        self, df: DataFrame, kind: str, extra_str: tuple[str, ...] = ()
    ) -> DataFrame:
        spec = KIND_SPECS.get(kind)
        if spec is None:
            raise ValueError(f"unknown table kind {kind!r}")
        cols = set(df.columns)
        out = df
        for c in tuple(spec.get("str", ())) + tuple(extra_str):
            if c in cols:
                out = out.withColumn(c, self._enc(F.col(c).cast("binary")))
        for c in spec.get("ts", ()):
            if c in cols:
                out = out.withColumn(
                    c,
                    self._enc(
                        F.unix_micros(F.col(c)).cast("string").cast("binary")
                    ),
                )
        for c in spec.get("bin", ()):
            if c in cols:
                out = out.withColumn(c, self._enc(F.col(c)))
        for c in spec.get("json", {}):
            if c in cols:
                out = out.withColumn(
                    c, self._enc(F.to_json(F.col(c)).cast("binary"))
                )
        return out

    def decrypt_df(
        self, df: DataFrame, kind: str, extra_str: tuple[str, ...] = ()
    ) -> DataFrame:
        spec = KIND_SPECS.get(kind)
        if spec is None:
            raise ValueError(f"unknown table kind {kind!r}")
        cols = set(df.columns)
        out = df
        for c in tuple(spec.get("str", ())) + tuple(extra_str):
            if c in cols:
                out = out.withColumn(c, F.decode(self._dec(F.col(c)), "UTF-8"))
        for c in spec.get("ts", ()):
            if c in cols:
                out = out.withColumn(
                    c,
                    F.timestamp_micros(
                        F.decode(self._dec(F.col(c)), "UTF-8").cast("long")
                    ),
                )
        for c in spec.get("bin", ()):
            if c in cols:
                out = out.withColumn(c, self._dec(F.col(c)))
        for c, typ in spec.get("json", {}).items():
            if c in cols:
                out = out.withColumn(
                    c, F.from_json(F.decode(self._dec(F.col(c)), "UTF-8"), typ)
                )
        return out
