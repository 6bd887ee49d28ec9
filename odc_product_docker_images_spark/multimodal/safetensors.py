"""Safetensors container round-trip (SURVEY.md §2.11 X5 extension —
the tensor-shipping sibling of ``tar_shards``).

Model weights and embedding dumps ship as safetensors: an 8-byte LE
header length, a JSON header mapping tensor name → {dtype, shape,
data_offsets}, then the raw little-endian tensor bytes.  This key packs
the fixture embeddings into real safetensors blobs (one per vec-id
batch, hand-assembled — the format is 30 lines of struct/json, no
external lib) and decodes them back with an independent hand parser,
emitting per-tensor facts (dim, first/last element, sequential
checksum) the FULL oracle recomputes straight from the embeddings table
— the blob layer must be information-preserving to the bit.

Scale shape: pack is one applyInPandas over the batch key; decode is an
Arrow map pass over blobs.  Both are map-side after a single corpus
shuffle — the same floor as any tensor-shard writer — and the decode
reads each tensor by OFFSET from the header, the seek-based contract
real loaders rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dround, sql_dround
from ..io import fanout, load
from ..registry import register

_BATCH = 50  # vectors per safetensors blob


def _pack(pdf):
    """One safetensors blob per batch: tensors in vec_id order,
    header keys sorted, no padding (f32 LE)."""
    import json
    import struct

    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("vec_id")
    header = {}
    payload = bytearray()
    for _, row in pdf.iterrows():
        arr = np.asarray(row["embedding"], dtype="<f4")
        start = len(payload)
        payload.extend(arr.tobytes())
        header[f"v{int(row['vec_id'])}"] = {
            "dtype": "F32",
            "shape": [int(arr.shape[0])],
            "data_offsets": [start, len(payload)],
        }
    hjson = json.dumps(header, sort_keys=True, separators=(",", ":")).encode()
    blob = struct.pack("<Q", len(hjson)) + hjson + bytes(payload)
    return pd.DataFrame(
        {
            "batch_id": [int(pdf["vec_id"].iloc[0]) // _BATCH],
            "st": [blob],
        }
    )


def _decode(it):
    """Independent parser: header length → JSON → per-tensor byte slice
    → f32 array; checksum is the SEQUENTIAL left-fold sum in f64 (the
    LIST_SUM order)."""
    import json
    import struct

    import numpy as np
    import pandas as pd

    for pdf in it:
        out = {"vec_id": [], "dim": [], "first_val": [], "last_val": [], "checksum": []}
        for blob in pdf["st"]:
            (hlen,) = struct.unpack("<Q", blob[:8])
            header = json.loads(blob[8 : 8 + hlen].decode())
            base = 8 + hlen
            for name, meta in header.items():
                if name == "__metadata__":
                    continue
                s, e = meta["data_offsets"]
                arr = np.frombuffer(blob[base + s : base + e], dtype="<f4")
                acc = 0.0
                for v in arr:
                    acc += float(v)
                out["vec_id"].append(int(name[1:]))
                out["dim"].append(int(arr.shape[0]))
                out["first_val"].append(float(arr[0]))
                out["last_val"].append(float(arr[-1]))
                out["checksum"].append(acc)
        yield pd.DataFrame(out)


@register(
    "multimodal_safetensors_roundtrip",
    oracle=f"""
        SELECT vec_id,
               CAST(LEN(embedding) AS BIGINT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               CAST(embedding[LEN(embedding)] AS DOUBLE) AS last_val,
               {sql_dround(
                   "LIST_SUM(LIST_TRANSFORM(embedding,"
                   " x -> CAST(x AS DOUBLE)))"
               )} AS checksum
        FROM embeddings
    """,
)
def multimodal_safetensors_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5+: embeddings → hand-assembled safetensors blobs → independent
    hand parser → per-tensor facts, oracled directly against the source
    table (dim, first/last f32 carried exactly into f64, sequential
    left-fold checksum rounded 6 dp — the LIST_SUM fold order)."""
    em = (
        load(spark, sf_dir, "embeddings")
        .repartition(fanout(spark), "vec_id")  # single-file input: parallelize the pack
        .select("vec_id", "embedding")
        .withColumn("batch_id", F.floor(F.col("vec_id") / _BATCH).cast("bigint"))
    )
    blobs = em.groupBy("batch_id").applyInPandas(_pack, "batch_id LONG, st BINARY")
    decoded = blobs.mapInPandas(
        _decode,
        "vec_id LONG, dim LONG, first_val DOUBLE, last_val DOUBLE, checksum DOUBLE",
    )
    return decoded.select(
        "vec_id", "dim", "first_val", "last_val", dround("checksum").alias("checksum")
    )
