"""WebDataset-shaped tar shards (north-star EXT; the standard
multimodal training-data container — Aizman et al.'s WebDataset
convention: samples as adjacent `{key}.{ext}` members inside plain
POSIX ustar shards, streamed sequentially at train time).

Public-knowledge provenance: POSIX.1-1988 ustar layout (512-byte
headers, octal ASCII numeric fields, checksum = byte sum of the
header with the chksum field read as spaces, two zero blocks as the
terminator) and the public WebDataset format notes.

Two halves, the repo's media-probe pattern:

- ``synthesize_tar_shards``: pack (id, text, cls) rows into per-shard
  tar payloads ENTIRELY in codegen — two members per sample
  (`{id}.txt` carrying the document text, `{id}.cls` carrying the
  label), headers with correct octal sizes and checksums, content
  padded to the 512 boundary, the two-zero-block trailer. Shard
  membership is the write_sharded content-addressed idiom
  (id % n_shards).
- ``parse_tar_members`` / ``decode_tar_features``: a REAL ustar
  walker (checksum verification against the spaces-convention sum,
  octal field parsing, padding skip, zero-block termination) run
  inside Arrow-batched mapInPandas. It parses tars produced by
  Python's tarfile (USTAR_FORMAT) too — pinned by a unit test — not
  just our synthesizer's output.

100 TB shape: packing is one groupBy(shard) with map-side member
construction; each shard payload is one row (the WebDataset contract
— shards are the unit of parallelism, samples stream within a
shard); unpacking is map-only over shards. The one-row-per-shard
materialization bounds shard size by executor memory — correct for
the WebDataset norm of ~100MB-1GB shards IF the caller grows
``n_shards`` with the corpus (shard SIZE stays bounded, COUNT
grows). A fixed shard count over an unbounded corpus OOMs by
construction — measured: 16 shards over the 500k-doc 100x probe
corpus packs ~31MB of hex per aggregation row and blows an 8g heap.
At petabyte scale the packer seam is a repartition(shard) +
foreachPartition streaming writer emitting the SAME member bytes —
documented here as the swap point; the parser half is unchanged.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOCK = 512

# fixed ustar header fields (everything but name, size, chksum)
_MODE = b"0000644\x00"
_UID = b"0000000\x00"
_GID = b"0000000\x00"
_MTIME = b"00000000000\x00"
_TYPEFLAG = b"0"
_LINKNAME = b"\x00" * 100
_MAGIC = b"ustar\x00"
_VERSION = b"00"
_UNAME = b"\x00" * 32
_GNAME = b"\x00" * 32
_DEVMAJOR = b"\x00" * 8
_DEVMINOR = b"\x00" * 8
_PREFIX = b"\x00" * 155
_PAD = b"\x00" * 12

# checksum contribution of all fixed fields + the 8-space chksum
# convention; name and size are added per member
_FIXED = (
    _MODE + _UID + _GID + _MTIME + b" " * 8 + _TYPEFLAG + _LINKNAME
    + _MAGIC + _VERSION + _UNAME + _GNAME + _DEVMAJOR + _DEVMINOR
    + _PREFIX + _PAD
)
_CONST_SUM = sum(_FIXED)
# ustar field order: name(0) mode(100) uid(108) gid(116) size(124)
# mtime(136) chksum(148) typeflag(156) ...
_FIXED_PRE_HEX = (_MODE + _UID + _GID).hex()
_FIXED_MID_HEX = _MTIME.hex()
_FIXED_POST_HEX = (
    _TYPEFLAG + _LINKNAME + _MAGIC + _VERSION + _UNAME + _GNAME
    + _DEVMAJOR + _DEVMINOR + _PREFIX + _PAD
).hex()


def _bytesum_expr(col_sql: str) -> str:
    """SQL text form of the ASCII byte sum — substring needs the
    loop variable, which the Python lambda API can't thread into
    substring's position argument cleanly, so this stays expr()."""
    return (
        f"aggregate(transform(sequence(1, length({col_sql})),"
        f" i -> ascii(substring({col_sql}, i, 1))),"
        " 0L, (acc, x) -> acc + x)"
    )


def _oct11(n):
    """11-digit zero-padded octal ASCII of a non-negative long."""
    return F.lpad(F.conv(n.cast("string"), 10, 8), 11, "0")


def synthesize_tar_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cls_col: str = "lang",
    n_shards: int = 16,
) -> DataFrame:
    """(shard, payload) — one POSIX ustar WebDataset shard per
    id%n_shards group, two members per sample, built in codegen."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    c = F.coalesce(F.col(cls_col), F.lit(""))

    def member_hex(content_col):
        size = F.octet_length(content_col).cast("long")
        # checksum: fixed fields (chksum read as spaces) + name bytes
        # + the 11 octal size digits (trailing NUL adds 0)
        chk = (
            F.lit(_CONST_SUM)
            + F.expr(_bytesum_expr("__name"))
            + F.expr(_bytesum_expr("__oct"))
        )
        chk_field = F.concat(
            F.hex(F.lpad(F.conv(chk.cast("string"), 10, 8), 6, "0")),
            F.lit("00"),   # '\0'
            F.lit("20"),   # convention space
        )
        header_hex = F.concat(
            F.rpad(F.hex(F.col("__name")), 200, "0"),      # name, 100 B
            F.lit(_FIXED_PRE_HEX.upper()),                 # mode uid gid
            F.hex(F.col("__oct")), F.lit("00"),            # size + NUL
            F.lit(_FIXED_MID_HEX.upper()),                 # mtime
            chk_field,
            F.lit(_FIXED_POST_HEX.upper()),
        )
        pad = (F.lit(_BLOCK) - size % _BLOCK) % _BLOCK
        return F.concat(
            header_hex,
            F.hex(content_col),
            F.repeat(F.lit("00"), pad.cast("int")),
        )

    base = df.select(
        (F.col(id_col) % n_shards).cast("bigint").alias("shard"),
        F.col(id_col).cast("long").alias("__id"),
        t.alias("__t"),
        c.alias("__c"),
    )
    txt = base.select(
        "shard", "__id",
        F.concat(F.col("__id").cast("string"), F.lit(".txt")).alias("__name"),
        F.col("__t").alias("__content"),
        F.lit(0).alias("__ord"),
    )
    cls = base.select(
        "shard", "__id",
        F.concat(F.col("__id").cast("string"), F.lit(".cls")).alias("__name"),
        F.col("__c").alias("__content"),
        F.lit(1).alias("__ord"),
    )
    members = txt.unionAll(cls).withColumn(
        "__oct", _oct11(F.octet_length(F.col("__content")).cast("long"))
    )
    member_frames = members.select(
        "shard", "__id", "__ord",
        member_hex(F.col("__content")).alias("__hex"),
    )
    shards = member_frames.groupBy("shard").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("__id", "__ord", F.col("__hex"))
                    )
                ),
                lambda s: s["__hex"],
            ),
            "",
        ).alias("__body")
    )
    trailer = "00" * (2 * _BLOCK)
    return shards.select(
        "shard",
        F.to_binary(
            F.concat(F.col("__body"), F.lit(trailer)), F.lit("hex")
        ).alias("payload"),
    )


def parse_tar_members(payload: bytes):
    """Walk a POSIX ustar archive: per member verify the header
    checksum (byte sum with the chksum field read as 8 spaces, both
    NUL- and space-terminated octal accepted), parse name/size, slurp
    content, skip block padding; terminate at a zero block. Returns
    a list of (name, content_bytes) or None on any malformation."""
    out = []
    pos, n = 0, len(payload)
    while pos + _BLOCK <= n:
        header = payload[pos : pos + _BLOCK]
        if header == b"\x00" * _BLOCK:
            return out  # terminator
        name = header[0:100].split(b"\x00", 1)[0]

        def octal(field: bytes) -> int | None:
            s = field.split(b"\x00", 1)[0].strip(b" \x00")
            if not s:
                return 0
            try:
                return int(s, 8)
            except ValueError:
                return None

        size = octal(header[124:136])
        stored_chk = octal(header[148:156])
        if size is None or stored_chk is None:
            return None
        summed = sum(header[:148]) + 8 * 0x20 + sum(header[156:])
        if summed != stored_chk:
            return None
        data_at = pos + _BLOCK
        if data_at + size > n:
            return None
        content = payload[data_at : data_at + size]
        out.append((name.decode("utf-8", "replace"), content))
        pos = data_at + size + ((_BLOCK - size % _BLOCK) % _BLOCK)
    return None  # ran off the end without a terminator


TAR_FEATURE_SCHEMA = (
    "shard long, n_members long, n_txt long, n_cls long, "
    "total_txt_bytes long, members_md5 string, ok boolean"
)


def decode_tar_features(shards: DataFrame) -> DataFrame:
    """Arrow-batched shard walk: member counts by extension, total
    .txt content bytes, and an order-insensitive md5 over the
    member-level (name, md5(content)) pairs — the content-level
    roundtrip pin a requery joins against."""
    import hashlib

    def one(shard, payload: bytes):
        members = parse_tar_members(payload if payload is not None else b"")
        if members is None:
            return shard, 0, 0, 0, 0, "", False
        n_txt = sum(1 for nm, _ in members if nm.endswith(".txt"))
        n_cls = sum(1 for nm, _ in members if nm.endswith(".cls"))
        tb = sum(len(c) for nm, c in members if nm.endswith(".txt"))
        digest = hashlib.md5(
            "|".join(
                sorted(
                    f"{nm}:{hashlib.md5(c).hexdigest()}"
                    for nm, c in members
                )
            ).encode()
        ).hexdigest()
        return shard, len(members), n_txt, n_cls, tb, digest, True

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                one(s, p) for s, p in zip(pdf["shard"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "shard": [f[0] for f in feats],
                    "n_members": [f[1] for f in feats],
                    "n_txt": [f[2] for f in feats],
                    "n_cls": [f[3] for f in feats],
                    "total_txt_bytes": [f[4] for f in feats],
                    "members_md5": [f[5] for f in feats],
                    "ok": [f[6] for f in feats],
                }
            )

    return shards.mapInPandas(batches, schema=TAR_FEATURE_SCHEMA)
