"""Reprojection stage: per-row UTM coordinates from the assigned granule zone.

The T1 analogue in the live pipeline (the reference reprojects every
variable through per-dataset transformer state,
/root/reference/src/eopf_geozarr/conversion/sentinel1_reprojection.py:20-108):
an actor-pool ``map_batches`` stage whose ``CachedTransformer`` builds one
transform per (src, dst) CRS pair on first use and reuses it across
batches. Rows are grouped by UTM zone (parsed from the ``mgrs`` code) and
each zone's points are transformed in one vectorized call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.proj import CachedTransformer


def parse_zone(mgrs_codes) -> np.ndarray:
    """UTM zone from synthetic MGRS codes ``T{zz}...`` (-1 for unassigned).

    Vectorized Arrow kernel (slice + cast); accepts an Arrow array/chunked
    array or anything ``pa.array`` can ingest.
    """
    import pyarrow.compute as pc

    col = (
        mgrs_codes
        if isinstance(mgrs_codes, (pa.Array, pa.ChunkedArray))
        else pa.array(list(mgrs_codes), type=pa.string())
    )
    ok = pc.and_(
        pc.equal(pc.utf8_slice_codeunits(col, 0, 1), "T"),
        pc.greater_equal(pc.utf8_length(col), 3),
    )
    ok = pc.fill_null(ok, False)
    digits = pc.if_else(ok, pc.utf8_slice_codeunits(col, 1, 3), "-1")
    zones = pc.cast(digits, pa.int64())
    return pc.fill_null(zones, -1).to_numpy(zero_copy_only=False)


class UtmReproject:
    """Adds ``utm_zone``, ``utm_e``, ``utm_n`` from (lat, lon, mgrs).

    ``ds.map_batches(UtmReproject, batch_format="pyarrow",
    zero_copy_batch=True, concurrency=(1, N))``. Rows without a granule
    assignment get nulls.
    """

    def __init__(self):
        self.transformer = CachedTransformer()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        zones = parse_zone(batch["mgrs"])
        e = np.full(len(batch), np.nan)
        n = np.full(len(batch), np.nan)
        for zone in np.unique(zones):
            if zone < 0:
                continue
            m = zones == zone
            ez, nz = self.transformer.transform(
                "EPSG:4326", f"EPSG:{32600 + zone}", lat[m], lon[m]
            )
            e[m] = ez
            n[m] = nz
        out = batch.append_column("utm_zone", pa.array(zones))
        out = out.append_column("utm_e", pa.array(e))
        out = out.append_column("utm_n", pa.array(n))
        return out


class GcpReproject:
    """Scattered-control-point reprojection stage — the reference's hard T1
    case (Sentinel-1 GRD georeferencing via GCP grids,
    /root/reference/src/eopf_geozarr/conversion/sentinel1_reprojection.py:
    111-138): imagery coordinates carry no affine, only sparse (row, col) ->
    (lon, lat) control points, and every pixel position is interpolated.

    The GCP table is small (a Sentinel-1 grid is ~200 points), so the fitted
    transformer is built ONCE per actor in ``__init__`` from broadcast GCP
    arrays (pass the ``ray.put`` handle via fn_constructor_kwargs, or the
    raw dict — both ship once per actor, never per batch) and applied
    vectorized per batch:

        gcps_ref = ray.put(gcps_dict)
        ds.map_batches(GcpReproject, fn_constructor_kwargs={"gcps": gcps_ref},
                       batch_format="pyarrow", zero_copy_batch=True,
                       concurrency=(1, N))
    """

    def __init__(
        self,
        gcps,
        *,
        row_col: str = "row",
        col_col: str = "col",
        method: str = "tps",
        order: int = 2,
        out_x: str = "lon",
        out_y: str = "lat",
    ):
        import ray

        from ..functions.gcp import fit_gcp_transformer

        if isinstance(gcps, ray.ObjectRef):
            gcps = ray.get(gcps)
        self.transformer = fit_gcp_transformer(
            np.asarray(gcps["row"], np.float64),
            np.asarray(gcps["col"], np.float64),
            np.asarray(gcps["x"], np.float64),
            np.asarray(gcps["y"], np.float64),
            method=method,
            order=order,
        )
        self.row_col, self.col_col = row_col, col_col
        self.out_x, self.out_y = out_x, out_y

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch[self.row_col].to_numpy(zero_copy_only=False)
        cols = batch[self.col_col].to_numpy(zero_copy_only=False)
        x, y = self.transformer.transform(rows, cols)
        out = batch.append_column(self.out_x, pa.array(x))
        return out.append_column(self.out_y, pa.array(y))
