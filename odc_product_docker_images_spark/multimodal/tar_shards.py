"""WebDataset-style tar shard packing + header-walk indexing
(SURVEY.md §2.11 X5 extension — the READ side of ``shard_pack``).

Large multimodal training corpora ship as tar shards (WebDataset /
tarfiles of sample members): loaders never untar, they seek straight to
member offsets from a sidecar index.  This key builds REAL ustar bytes
per shard (stdlib ``tarfile``, deterministic headers: mtime=0, uid=gid=0)
and then recovers the index by hand-walking the 512-byte header blocks —
name from the NUL-terminated field at [0:100], size from the octal field
at [124:136] — so the parse is independent of the writer library.

The FULL oracle never touches the bytes: ustar layout is arithmetic.
Member i of a shard sits at offset Σ_{j<i} (512 + 512·⌈size_j/512⌉) in
doc-id order, so DuckDB replays the index as a cumulative window sum
over OCTET_LENGTH — byte-exact agreement proves both the writer's layout
and the parser's walk.

Scale shape: pack is one applyInPandas over the shard key (the shuffle
is the corpus once, the same cost any shard writer pays); the index walk
is an Arrow map pass over shard blobs touching only header blocks
(O(members), not O(bytes), per the seek-based contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import fanout, load
from ..registry import register

_SHARD_DOCS = 50  # docs per shard (doc_id // _SHARD_DOCS)


def _pack(pdf):
    """One tar blob per shard: members in doc_id order, deterministic
    ustar headers."""
    import io
    import tarfile

    import pandas as pd

    pdf = pdf.sort_values("doc_id")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for _, row in pdf.iterrows():
            data = row["text"].encode("utf-8")
            info = tarfile.TarInfo(name=f"{int(row['doc_id'])}.txt")
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    return pd.DataFrame(
        {
            "shard_id": [int(pdf["doc_id"].iloc[0]) // _SHARD_DOCS],
            "tar": [buf.getvalue()],
        }
    )


def _walk(it):
    """Hand-walk ustar header blocks → (shard_id, member, offset, size)."""
    import pandas as pd

    for pdf in it:
        out = {"shard_id": [], "member": [], "offset": [], "data_size": []}
        for shard_id, blob in zip(pdf["shard_id"], pdf["tar"]):
            pos = 0
            while pos + 512 <= len(blob):
                hdr = blob[pos : pos + 512]
                if hdr[0] == 0:  # two zero blocks terminate the archive
                    break
                name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8")
                size = int(hdr[124:136].split(b"\x00", 1)[0].strip() or b"0", 8)
                out["shard_id"].append(int(shard_id))
                out["member"].append(name)
                out["offset"].append(pos)
                out["data_size"].append(size)
                pos += 512 + ((size + 511) // 512) * 512
        yield pd.DataFrame(out)


@register(
    "multimodal_tar_index",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(doc_id AS BIGINT) // {_SHARD_DOCS} AS shard_id,
                   OCTET_LENGTH(ENCODE(text)) AS sz
            FROM documents
        )
        SELECT shard_id,
               CAST(doc_id AS VARCHAR) || '.txt' AS member,
               CAST(COALESCE(SUM(512 + 512 * ((sz + 511) // 512)) OVER (
                   PARTITION BY shard_id ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS offset,
               CAST(sz AS BIGINT) AS data_size
        FROM d
    """,
)
def multimodal_tar_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5+: pack documents into real ustar shard blobs, then recover the
    member index by hand-walking header blocks.  The oracle replays the
    ustar layout as pure offset arithmetic (cumulative padded sizes per
    shard) — byte-exact writer AND parser verification without the
    oracle ever seeing a byte."""
    docs = (
        load(spark, sf_dir, "documents")
        .repartition(fanout(spark), "doc_id")  # single-file input: parallelize the pack
        .select("doc_id", "text")
        .withColumn(
            "shard_id", F.floor(F.col("doc_id") / _SHARD_DOCS).cast("bigint")
        )
    )
    shards = docs.groupBy("shard_id").applyInPandas(
        _pack, "shard_id LONG, tar BINARY"
    )
    return shards.mapInPandas(
        _walk, "shard_id LONG, member STRING, offset LONG, data_size LONG"
    )
