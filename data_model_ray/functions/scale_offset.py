"""CF scale/offset packing codec as Arrow expressions (SURVEY.md M10).

Semantics re-derived from the reference's ScaleOffset codec + CF attrs
(/root/reference/src/eopf_geozarr/codecs/scale_offset.py:15-27,
s2_optimization/s2_multiscale.py:478-532): a float value is stored as an
integer ``round((value - add_offset) / scale_factor)`` with a fill-value
sentinel for nulls; decode is ``stored * scale_factor + add_offset`` with
the sentinel mapped back to null.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def encode_scale_offset(
    values: pa.Array | pa.ChunkedArray,
    *,
    scale_factor: float,
    add_offset: float = 0.0,
    fill_value: int = -9999,
    dtype: pa.DataType = pa.int32(),
) -> pa.Array | pa.ChunkedArray:
    """float -> packed integer column; nulls become `fill_value`."""
    packed = pc.round(
        pc.divide(pc.subtract(values, pa.scalar(add_offset)), pa.scalar(scale_factor))
    )
    packed = pc.cast(packed, dtype)
    return pc.fill_null(packed, pa.scalar(fill_value, type=dtype))


def decode_scale_offset(
    stored: pa.Array | pa.ChunkedArray,
    *,
    scale_factor: float,
    add_offset: float = 0.0,
    fill_value: int = -9999,
) -> pa.Array | pa.ChunkedArray:
    """packed integer -> float column; `fill_value` becomes null."""
    is_fill = pc.equal(stored, pa.scalar(fill_value, type=stored.type))
    masked = pc.if_else(is_fill, pa.scalar(None, type=stored.type), stored)
    return pc.add(
        pc.multiply(pc.cast(masked, pa.float64()), pa.scalar(scale_factor)),
        pa.scalar(add_offset),
    )


def make_codec_stage(
    columns: dict[str, dict], *, mode: str = "encode"
):
    """A map_batches-ready kernel applying the codec to several columns.

    ``columns`` maps column name -> {scale_factor, add_offset, fill_value}.
    The per-variable encoding-planner analogue
    (/root/reference/src/eopf_geozarr/conversion/geozarr.py:1382-1422).
    """
    if mode not in ("encode", "decode"):
        raise ValueError(mode)

    def kernel(batch: pa.Table) -> pa.Table:
        for name, params in columns.items():
            idx = batch.column_names.index(name)
            fn = encode_scale_offset if mode == "encode" else decode_scale_offset
            batch = batch.set_column(idx, name, fn(batch[name], **params))
        return batch

    return kernel
