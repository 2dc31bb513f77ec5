"""URL-seen set: partitioned Bloom filter + cuckoo fallback.

The reference's seen-set analogues are driver-local dicts/sets
(analysis/12_new_author_distribution.py:61-77 first_seen dict;
generation/src/openalex_json.cpp:128-134 AffMap distinct-insert).
At 10^10 URLs neither fits one machine, so:

- **Exactness** comes from a plain ``left_anti`` join of candidate
  url_hashes against the seen table — distributed, spill-safe,
  co-partitioned on ``pmod(url_hash, P)``.
- **Efficiency** comes from a *partitioned Bloom prefilter*: one
  numpy bit-array blob per hash-partition, built with
  ``applyInPandas`` (Arrow-vectorized; no per-row Python). Probing
  drops the overwhelming majority of already-seen candidates before
  they reach the anti-join shuffle. False positives are safe — the
  anti-join is still consulted only for *survivors*' exactness; false
  negatives cannot occur.
- **Deletions** (recrawl policies) break Blooms, so a partition-local
  **cuckoo filter** (vectorized numpy, 4-slot buckets, 16-bit
  fingerprints) is provided as the fallback with the same
  build/probe API plus ``delete``.

Partitioning: blobs are keyed by ``part = pmod(url_hash, n_parts)``;
candidates repartition on the same key, so probe is a 1:1
co-partitioned join of each candidate slice with exactly one blob —
no broadcast of the full filter, which at 10^10 keys would be tens
of GB.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------- bloom core


def _bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    n = max(n_items, 1)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 8)


def _bloom_positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """Double hashing: pos_j = (h1 + j*h2) mod m, vectorized (n,k)."""
    h = h.astype(np.uint64)
    h1 = h % np.uint64(m)
    h2 = (h >> np.uint64(17) | np.uint64(1)) % np.uint64(m)
    j = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + j * h2[:, None]) % np.uint64(m)


def bloom_build_blob(hashes: np.ndarray, fpp: float = 0.01) -> bytes:
    m, k = _bloom_params(len(hashes), fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    if len(hashes):
        pos = _bloom_positions(np.asarray(hashes), m, k).ravel()
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    header = np.array([m, k], dtype=np.uint64).tobytes()
    return header + bits.tobytes()


def bloom_probe_blob(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    """Boolean 'maybe seen' per hash (vectorized)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    m, k = np.frombuffer(blob[:16], dtype=np.uint64)
    bits = np.frombuffer(blob[16:], dtype=np.uint8)
    pos = _bloom_positions(np.asarray(hashes), int(m), int(k))
    hit = (bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
    return hit.all(axis=1).astype(bool)


# ------------------------------------------------- fixed-size bloom (incremental)


def fixed_bloom_build_blob(hashes: np.ndarray, m_bits: int, k: int) -> bytes:
    """Bloom blob with caller-pinned (m, k) — OR-mergeable across
    builds, enabling incremental maintenance (new deltas OR into the
    standing blob instead of rebuilding over the full seen set)."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(hashes):
        pos = _bloom_positions(np.asarray(hashes), m_bits, k).ravel()
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    header = np.array([m_bits, k], dtype=np.uint64).tobytes()
    return header + bits.tobytes()


def bloom_or_blobs(a: bytes | None, b: bytes | None) -> bytes | None:
    if a is None:
        return b
    if b is None:
        return a
    ha, hb = a[:16], b[:16]
    assert ha == hb, "bloom OR-merge requires identical (m,k)"
    bits = np.frombuffer(a[16:], dtype=np.uint8) | np.frombuffer(b[16:], dtype=np.uint8)
    return ha + bits.tobytes()


def merge_bloom_tables(
    prev: DataFrame | None,
    new_hashes: DataFrame,
    hash_col: str = "url_hash",
    n_parts: int = 32,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Incremental per-partition blobs: build fixed-size blooms over
    the new delta and OR them into the previous blobs. One small
    shuffle on ``part`` (the delta), never a rescan of the full seen
    set — the maintenance cost per batch is O(|delta| + n_parts)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part"].iloc[0]) if len(pdf) else 0
        blob = fixed_bloom_build_blob(
            pdf["h"].to_numpy(np.int64).view(np.uint64), m_bits, k
        )
        return pd.DataFrame({"part": [part], "blob": [blob]})

    keyed = new_hashes.select(
        F.col(hash_col).alias("h"), F.pmod(F.col(hash_col), F.lit(n_parts)).alias("part")
    )
    delta = keyed.groupBy("part").applyInPandas(build, schema="part int, blob binary")
    if prev is None:
        return delta
    both = prev.select("part", "blob").unionByName(delta)

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = None
        for b in pdf["blob"]:
            blob = bloom_or_blobs(blob, None if b is None else bytes(b))
        return pd.DataFrame({"part": [int(pdf["part"].iloc[0])], "blob": [blob]})

    return both.groupBy("part").applyInPandas(or_group, schema="part int, blob binary")


# --------------------------------------------------------- bloom on Spark


def build_bloom_table(
    seen: DataFrame, hash_col: str = "url_hash", n_parts: int = 32, fpp: float = 0.01
) -> DataFrame:
    """(part, blob): one Bloom blob per hash partition of the seen set."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part"].iloc[0]) if len(pdf) else 0
        blob = bloom_build_blob(pdf["h"].to_numpy(np.int64).view(np.uint64), fpp)
        return pd.DataFrame({"part": [part], "blob": [blob]})

    keyed = seen.select(
        F.col(hash_col).alias("h"), F.pmod(F.col(hash_col), F.lit(n_parts)).alias("part")
    )
    return keyed.groupBy("part").applyInPandas(build, schema="part int, blob binary")


def bloom_filter_candidates(
    candidates: DataFrame,
    bloom_table: DataFrame,
    hash_col: str = "url_hash",
    n_parts: int = 32,
) -> DataFrame:
    """Returns candidates + a ``maybe_seen`` flag; callers treat
    ``~maybe_seen`` rows as definitely-new (Bloom has no false
    negatives) and exact-check only the maybe-seen survivors.

    Implemented as a ``cogroup`` on ``part``: each hash partition of
    the candidates meets its single blob row exactly once — the blob
    (100s of KB) is NEVER replicated per candidate row, and the probe
    itself is one vectorized numpy pass per group."""
    keyed = candidates.withColumn(
        "part", F.pmod(F.col(hash_col), F.lit(n_parts)).cast("int")
    )
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keyed.schema.fields)
        + ", maybe_seen boolean"
    )
    cols = [f.name for f in keyed.schema.fields]

    def probe(cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand_pdf[cols].copy()
        if len(blob_pdf) and blob_pdf["blob"].iloc[0] is not None:
            blob = bytes(blob_pdf["blob"].iloc[0])
            h = cand_pdf[hash_col].to_numpy(np.int64).view(np.uint64)
            out["maybe_seen"] = bloom_probe_blob(blob, h)
        else:
            out["maybe_seen"] = False
        return out

    return (
        keyed.groupBy("part")
        .cogroup(bloom_table.groupBy("part"))
        .applyInPandas(lambda key, c, b: probe(c, b), schema=schema)
    )


def mark_new_against_seen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom_table: DataFrame,
    hash_col: str = "url_hash",
    n_parts: int = 32,
    survivor_join: str = "broadcast",
) -> DataFrame:
    """Candidates + exact ``is_new`` flag. Bloom probe first; only the
    maybe-seen *survivors* are exact-checked against the seen table.

    survivor_join:
      - ``"broadcast"``: survivors broadcast into a semi-join that only
        SCANS seen, the small matched set broadcast back — zero shuffle
        of the seen table. Right when survivors are small (typical
        batch: survivors ≈ true dups + fp-rate × new).
      - ``"shuffle"``: co-partitioned shuffle joins on ``hash_col`` —
        the scale-safe fallback when a recrawl-heavy batch would make
        the survivor set too large to broadcast (driver/executor OOM
        at 10^10 scale). On a real deployment the seen table is
        bucketed on the hash, so "shuffle" moves only the candidates.

    Callers should ``.cache()`` the result before taking multiple
    actions on it (the probe + scans re-execute otherwise)."""
    flagged = bloom_filter_candidates(candidates, bloom_table, hash_col, n_parts)
    survivors = flagged.where(F.col("maybe_seen")).select(hash_col)
    if survivor_join == "broadcast":
        matched = (
            seen.select(hash_col)
            .join(F.broadcast(survivors), hash_col, "left_semi")
            .withColumn("__matched", F.lit(1))
        )
        out = flagged.join(F.broadcast(matched), hash_col, "left")
    else:
        matched = (
            seen.select(hash_col)
            .join(survivors, hash_col, "left_semi")
            .withColumn("__matched", F.lit(1))
        )
        out = flagged.join(matched, hash_col, "left")
    out = out.withColumn("is_new", ~F.col("maybe_seen") | F.col("__matched").isNull())
    return out.drop("__matched", "maybe_seen", "part")


# ------------------------------------------------------------ cuckoo core


class CuckooFilter:
    """Partition-local cuckoo filter: 4-slot buckets, 16-bit
    fingerprints, supports delete (the Bloom fallback for recrawl).

    Vectorized numpy storage; insert loop is per-item (amortized O(1),
    used only for filter maintenance — membership probes are
    vectorized)."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        n_buckets = 1
        while n_buckets * self.SLOTS < capacity * 1.05:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self._rng_state = 0x9E3779B9

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # standard partial-key cuckoo: i2 = i1 xor hash(fp)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(self.n_buckets - 1)
        return (i1.astype(np.uint64) ^ fph).astype(np.int64)

    def insert_many(self, hashes: np.ndarray) -> int:
        h = hashes.view(np.uint64) if hashes.dtype == np.int64 else hashes.astype(np.uint64)
        fps, i1s = self._fp(h), self._i1(h)
        i2s = self._i2(i1s, fps)
        n_fail = 0
        for fp, i1, i2 in zip(fps, i1s, i2s):
            if not self._insert_one(int(fp), int(i1), int(i2)):
                n_fail += 1
        return n_fail

    def _insert_one(self, fp: int, i1: int, i2: int) -> bool:
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        i = i1
        for _ in range(self.MAX_KICKS):
            self._rng_state = (1103515245 * self._rng_state + 12345) % (1 << 31)
            slot = self._rng_state % self.SLOTS
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            fph = (fp * 0x5BD1E995) & (self.n_buckets - 1)
            i ^= fph
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.view(np.uint64) if hashes.dtype == np.int64 else hashes.astype(np.uint64)
        fps, i1s = self._fp(h), self._i1(h)
        i2s = self._i2(i1s, fps)
        in1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, hashes: np.ndarray) -> int:
        h = hashes.view(np.uint64) if hashes.dtype == np.int64 else hashes.astype(np.uint64)
        fps, i1s = self._fp(h), self._i1(h)
        i2s = self._i2(i1s, fps)
        n = 0
        for fp, i1, i2 in zip(fps, i1s, i2s):
            for i in (int(i1), int(i2)):
                slots = np.nonzero(self.table[i] == fp)[0]
                if len(slots):
                    self.table[i, slots[0]] = 0
                    n += 1
                    break
        return n

    def to_bytes(self) -> bytes:
        return (
            np.array([self.n_buckets], dtype=np.uint64).tobytes() + self.table.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        n_buckets = int(np.frombuffer(blob[:8], dtype=np.uint64)[0])
        obj = cls.__new__(cls)
        obj.n_buckets = n_buckets
        obj.table = (
            np.frombuffer(blob[8:], dtype=np.uint16).reshape(n_buckets, cls.SLOTS).copy()
        )
        obj._rng_state = 0x9E3779B9
        return obj


def build_cuckoo_table(
    seen: DataFrame, hash_col: str = "url_hash", n_parts: int = 32, headroom: float = 1.5
) -> DataFrame:
    """(part, blob) cuckoo-filter table — same layout as the Bloom
    table but deletable."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part"].iloc[0]) if len(pdf) else 0
        cf = CuckooFilter(max(64, int(len(pdf) * headroom)))
        cf.insert_many(pdf["h"].to_numpy(np.int64))
        return pd.DataFrame({"part": [part], "blob": [cf.to_bytes()]})

    keyed = seen.select(
        F.col(hash_col).alias("h"), F.pmod(F.col(hash_col), F.lit(n_parts)).alias("part")
    )
    return keyed.groupBy("part").applyInPandas(build, schema="part int, blob binary")


# ---------------------------------------------------------- exact dedup


def dedup_against_seen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom_table: DataFrame | None = None,
    hash_col: str = "url_hash",
    n_parts: int = 32,
) -> DataFrame:
    """Exactly-new candidates: Bloom prefilter (optional) then an
    exact check on the seen table. The prefilter's definitely-new
    rows bypass the exact check entirely.

    The exact check avoids shuffling the (huge) seen table: survivors
    are broadcast into a semi-join that *streams* seen (scan only),
    and the small matched set is broadcast back for the final
    anti-join. Net shuffle volume: zero; seen is only ever scanned."""
    if bloom_table is None:
        return candidates.join(seen.select(hash_col), hash_col, "left_anti")
    marked = mark_new_against_seen(candidates, seen, bloom_table, hash_col, n_parts)
    return marked.where(F.col("is_new")).drop("is_new")
