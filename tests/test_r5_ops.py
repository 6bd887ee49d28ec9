"""Round-5 operator tests: GeoTIFF sink codec, curvilinear reprojection,
solar-day grouping, BPE train step, WOfS confidence."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def test_geotiff_codec_is_spec_real():
    """The sink's encoder must produce a real classic TIFF the independent
    decoder can walk: strips round-trip the raster, geo tags recover the
    model transform, and corrupted layout fails loudly."""
    from odc_product_docker_images_spark.multimodal.geotiff import (
        _EPSG,
        _SCALE,
        _TIEPOINT,
        _decode_tiff,
        _pack_tiff,
    )

    rng = np.random.default_rng(7)
    raster = rng.integers(0, 65536, size=(15, 24), dtype=np.uint16)
    payload = _pack_tiff(raster)

    w, h, back, ps, tp, gk = _decode_tiff(payload)
    assert (w, h) == (24, 15)
    assert np.array_equal(back, raster)
    assert ps == _SCALE and tp == _TIEPOINT
    keys = {gk[4 + 4 * i]: gk[7 + 4 * i] for i in range((len(gk) - 4) // 4)}
    assert keys[2048] == _EPSG and keys[1024] == 2  # geographic CRS model

    # non-TIFF magic -> NotImplementedError (honest-codec contract)
    with pytest.raises(NotImplementedError):
        _decode_tiff(b"MM\x00*" + payload[4:])  # big-endian not supported

    # corrupt a strip byte count -> layout validation fires
    bad = bytearray(payload)
    # StripByteCounts array lives right after the offsets array; flip one
    sbc_entry = payload.index(struct.pack("<HHI", 279, 4, 15))
    (sbc_off,) = struct.unpack_from("<I", payload, sbc_entry + 8)
    struct.pack_into("<I", bad, sbc_off, 7)  # not w*2
    with pytest.raises(ValueError, match="strip layout"):
        _decode_tiff(bytes(bad))
