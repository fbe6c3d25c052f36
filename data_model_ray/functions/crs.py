"""Multi-encoding CRS model — proj:code / proj:wkt2 / proj:projjson.

Re-derives the reference's Proj convention semantics
(/root/reference/src/eopf_geozarr/data_api/geozarr/geoproj.py:20-37): a CRS
attribute object carries up to three encodings and is valid iff AT LEAST ONE
of ``proj:code``, ``proj:wkt2``, ``proj:projjson`` is present. The reference
validates projjson against pydantic models of the PROJ JSON v0.7 schema
(/root/reference/src/eopf_geozarr/data_api/geozarr/projjson.py:1-690,
tests/test_data_api/test_projjson.py); here the analogue is a from-scratch
structural validator (`validate_projjson`) over plain dicts — no pydantic,
no proj library, public schema semantics only
(https://proj.org/schemas/v0.7/projjson.schema.json).

Generators cover the CRSs this engine actually emits: EPSG:4326 (geographic),
EPSG:3857 (Web Mercator) and EPSG:326xx (WGS84 / UTM northern zones) — the
same family the reference's Sentinel-2 products carry.
"""

from __future__ import annotations

from typing import Any

# --- encoding generators ----------------------------------------------------

_WGS84_DATUM_WKT = (
    'ENSEMBLE["World Geodetic System 1984 ensemble",'
    'MEMBER["World Geodetic System 1984 (G2296)"],'
    'ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]],'
    "ENSEMBLEACCURACY[2.0]]"
)

_WGS84_DATUM_JSON: dict[str, Any] = {
    "type": "DatumEnsemble",
    "name": "World Geodetic System 1984 ensemble",
    "members": [{"name": "World Geodetic System 1984 (G2296)"}],
    "ellipsoid": {
        "name": "WGS 84",
        "semi_major_axis": 6378137,
        "inverse_flattening": 298.257223563,
    },
    "accuracy": "2.0",
}


def wkt2_for(code: str) -> str:
    """WKT2:2019 string for a supported EPSG code (from-scratch emitter)."""
    epsg = _parse_epsg(code)
    if epsg == 4326:
        return (
            'GEOGCRS["WGS 84",' + _WGS84_DATUM_WKT + ","
            'CS[ellipsoidal,2],'
            'AXIS["geodetic latitude (Lat)",north,ANGLEUNIT["degree",0.0174532925199433]],'
            'AXIS["geodetic longitude (Lon)",east,ANGLEUNIT["degree",0.0174532925199433]],'
            'ID["EPSG",4326]]'
        )
    if epsg == 3857:
        return (
            'PROJCRS["WGS 84 / Pseudo-Mercator",'
            'BASEGEOGCRS["WGS 84",' + _WGS84_DATUM_WKT + "],"
            'CONVERSION["Popular Visualisation Pseudo-Mercator",'
            'METHOD["Popular Visualisation Pseudo Mercator",ID["EPSG",1024]],'
            'PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433]],'
            'PARAMETER["Longitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433]],'
            'PARAMETER["False easting",0,LENGTHUNIT["metre",1]],'
            'PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],'
            'CS[Cartesian,2],'
            'AXIS["easting (X)",east,LENGTHUNIT["metre",1]],'
            'AXIS["northing (Y)",north,LENGTHUNIT["metre",1]],'
            'ID["EPSG",3857]]'
        )
    if 32601 <= epsg <= 32660:
        zone = epsg - 32600
        lon0 = zone * 6 - 183
        return (
            f'PROJCRS["WGS 84 / UTM zone {zone}N",'
            'BASEGEOGCRS["WGS 84",' + _WGS84_DATUM_WKT + "],"
            f'CONVERSION["UTM zone {zone}N",'
            'METHOD["Transverse Mercator",ID["EPSG",9807]],'
            'PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433]],'
            f'PARAMETER["Longitude of natural origin",{lon0},ANGLEUNIT["degree",0.0174532925199433]],'
            'PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1]],'
            'PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],'
            'PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],'
            'CS[Cartesian,2],'
            'AXIS["easting (E)",east,LENGTHUNIT["metre",1]],'
            'AXIS["northing (N)",north,LENGTHUNIT["metre",1]],'
            f'ID["EPSG",{epsg}]]'
        )
    raise ValueError(f"no WKT2 emitter for EPSG:{epsg}")


def projjson_for(code: str) -> dict[str, Any]:
    """Minimal PROJ JSON v0.7 dict for a supported EPSG code."""
    epsg = _parse_epsg(code)
    schema = "https://proj.org/schemas/v0.7/projjson.schema.json"
    deg = {"type": "AngularUnit", "name": "degree", "conversion_factor": 0.0174532925199433}
    metre = {"type": "LinearUnit", "name": "metre", "conversion_factor": 1}
    base_geog = {
        "type": "GeographicCRS",
        "name": "WGS 84",
        "datum_ensemble": _WGS84_DATUM_JSON,
        "coordinate_system": {
            "type": "CoordinateSystem",
            "subtype": "ellipsoidal",
            "axis": [
                {"type": "Axis", "name": "Geodetic latitude", "abbreviation": "Lat", "direction": "north", "unit": deg},
                {"type": "Axis", "name": "Geodetic longitude", "abbreviation": "Lon", "direction": "east", "unit": deg},
            ],
        },
    }
    if epsg == 4326:
        return {
            "$schema": schema,
            **base_geog,
            "id": {"authority": "EPSG", "code": 4326},
        }
    cart = {
        "type": "CoordinateSystem",
        "subtype": "Cartesian",
        "axis": [
            {"type": "Axis", "name": "Easting", "abbreviation": "E", "direction": "east", "unit": metre},
            {"type": "Axis", "name": "Northing", "abbreviation": "N", "direction": "north", "unit": metre},
        ],
    }
    if epsg == 3857:
        return {
            "$schema": schema,
            "type": "ProjectedCRS",
            "name": "WGS 84 / Pseudo-Mercator",
            "base_crs": base_geog,
            "conversion": {
                "type": "Conversion",
                "name": "Popular Visualisation Pseudo-Mercator",
                "method": {"type": "Method", "name": "Popular Visualisation Pseudo Mercator", "id": {"authority": "EPSG", "code": 1024}},
                "parameters": [
                    {"type": "ParameterValue", "name": "Latitude of natural origin", "value": 0, "unit": deg},
                    {"type": "ParameterValue", "name": "Longitude of natural origin", "value": 0, "unit": deg},
                    {"type": "ParameterValue", "name": "False easting", "value": 0, "unit": metre},
                    {"type": "ParameterValue", "name": "False northing", "value": 0, "unit": metre},
                ],
            },
            "coordinate_system": cart,
            "id": {"authority": "EPSG", "code": 3857},
        }
    if 32601 <= epsg <= 32660:
        zone = epsg - 32600
        return {
            "$schema": schema,
            "type": "ProjectedCRS",
            "name": f"WGS 84 / UTM zone {zone}N",
            "base_crs": base_geog,
            "conversion": {
                "type": "Conversion",
                "name": f"UTM zone {zone}N",
                "method": {"type": "Method", "name": "Transverse Mercator", "id": {"authority": "EPSG", "code": 9807}},
                "parameters": [
                    {"type": "ParameterValue", "name": "Latitude of natural origin", "value": 0, "unit": deg},
                    {"type": "ParameterValue", "name": "Longitude of natural origin", "value": zone * 6 - 183, "unit": deg},
                    {"type": "ParameterValue", "name": "Scale factor at natural origin", "value": 0.9996, "unit": {"type": "ScaleUnit", "name": "unity", "conversion_factor": 1}},
                    {"type": "ParameterValue", "name": "False easting", "value": 500000, "unit": metre},
                    {"type": "ParameterValue", "name": "False northing", "value": 0, "unit": metre},
                ],
            },
            "coordinate_system": cart,
            "id": {"authority": "EPSG", "code": epsg},
        }
    raise ValueError(f"no PROJJSON emitter for EPSG:{epsg}")


def proj_encodings(code: str) -> dict[str, Any]:
    """All three encodings for a code — the manifest's `proj` attr object."""
    return {
        "proj:code": f"EPSG:{_parse_epsg(code)}",
        "proj:wkt2": wkt2_for(code),
        "proj:projjson": projjson_for(code),
    }


def _parse_epsg(code: str | int) -> int:
    if isinstance(code, int):
        return code
    return int(str(code).upper().replace("EPSG:", ""))


# --- validation -------------------------------------------------------------


def validate_proj_attrs(attrs: dict[str, Any]) -> list[str]:
    """`Proj` model analogue (geoproj.py:27-34): at least one encoding must
    be present; each present encoding must be well-formed. Returns problems
    (empty == valid)."""
    problems: list[str] = []
    code = attrs.get("proj:code")
    wkt2 = attrs.get("proj:wkt2")
    pj = attrs.get("proj:projjson")
    if not any([code, wkt2, pj]):
        return [
            "at least one of proj:code, proj:wkt2, or proj:projjson must be provided"
        ]
    if code is not None:
        s = str(code).upper()
        if not (s.startswith("EPSG:") and s[5:].isdigit()):
            problems.append(f"proj:code {code!r} is not an AUTHORITY:CODE string")
    if wkt2 is not None:
        problems += _validate_wkt2(str(wkt2))
    if pj is not None:
        problems += validate_projjson(pj)
    return problems


def _validate_wkt2(wkt: str) -> list[str]:
    problems = []
    head = wkt.lstrip()[:12].upper()
    if not any(
        head.startswith(k)
        for k in ("GEOGCRS", "PROJCRS", "GEODCRS", "VERTCRS", "COMPOUNDCRS", "ENGCRS")
    ):
        problems.append("proj:wkt2 does not start with a WKT2 CRS keyword")
    if wkt.count("[") != wkt.count("]"):
        problems.append("proj:wkt2 has unbalanced brackets")
    return problems


_CRS_TYPES = {
    "GeographicCRS",
    "GeodeticCRS",
    "ProjectedCRS",
    "VerticalCRS",
    "CompoundCRS",
    "TemporalCRS",
    "EngineeringCRS",
    "ParametricCRS",
    "DerivedGeodeticCRS",
    "DerivedProjectedCRS",
    "BoundCRS",
}

_AXIS_DIRECTIONS = {
    "north", "northNorthEast", "northEast", "eastNorthEast", "east",
    "eastSouthEast", "southEast", "southSouthEast", "south", "southSouthWest",
    "southWest", "westSouthWest", "west", "westNorthWest", "northWest",
    "northNorthWest", "up", "down", "geocentricX", "geocentricY",
    "geocentricZ", "columnPositive", "columnNegative", "rowPositive",
    "rowNegative", "displayRight", "displayLeft", "displayUp", "displayDown",
    "forward", "aft", "port", "starboard", "clockwise", "counterClockwise",
    "towards", "awayFrom", "future", "past", "unspecified",
}


def validate_projjson(d: Any, path: str = "projjson") -> list[str]:
    """Structural PROJ JSON v0.7 check over plain dicts.

    Mirrors what the reference's pydantic models enforce
    (projjson.py: Id/Unit/Axis/CoordinateSystem/GeodeticCRS/ProjectedCRS):
    known CRS `type`, `name` present, coordinate_system axes with legal
    directions and units, datum XOR datum_ensemble on geodetic CRSs,
    ProjectedCRS requiring base_crs + conversion, id authority/code shape,
    and the id/ids mutual exclusion.
    """
    problems: list[str] = []
    if not isinstance(d, dict):
        return [f"{path}: not an object"]
    t = d.get("type")
    if t not in _CRS_TYPES:
        problems.append(f"{path}: unknown or missing CRS type {t!r}")
        return problems
    if not d.get("name"):
        problems.append(f"{path}: missing name")
    problems += _check_id_fields(d, path)

    if t in ("GeographicCRS", "GeodeticCRS"):
        has_datum = "datum" in d
        has_ens = "datum_ensemble" in d
        if has_datum == has_ens:
            problems.append(
                f"{path}: geodetic CRS needs exactly one of datum / datum_ensemble"
            )
        if has_ens:
            ens = d["datum_ensemble"]
            if not isinstance(ens, dict) or "members" not in ens or "ellipsoid" not in ens:
                problems.append(f"{path}.datum_ensemble: needs members + ellipsoid")
        problems += _check_cs(d.get("coordinate_system"), f"{path}.coordinate_system")
    elif t == "ProjectedCRS":
        if "base_crs" not in d:
            problems.append(f"{path}: ProjectedCRS missing base_crs")
        else:
            problems += validate_projjson(d["base_crs"], f"{path}.base_crs")
        conv = d.get("conversion")
        if not isinstance(conv, dict):
            problems.append(f"{path}: ProjectedCRS missing conversion")
        else:
            if not isinstance(conv.get("method"), dict) or not conv["method"].get("name"):
                problems.append(f"{path}.conversion: missing method.name")
            for i, p in enumerate(conv.get("parameters", [])):
                if not isinstance(p, dict) or "name" not in p or "value" not in p:
                    problems.append(f"{path}.conversion.parameters[{i}]: needs name+value")
        problems += _check_cs(d.get("coordinate_system"), f"{path}.coordinate_system")
    return problems


def _check_id_fields(d: dict, path: str) -> list[str]:
    problems = []
    if "id" in d and "ids" in d:
        problems.append(f"{path}: cannot specify both 'id' and 'ids'")
    if "id" in d:
        i = d["id"]
        if not isinstance(i, dict) or "authority" not in i or "code" not in i:
            problems.append(f"{path}.id: needs authority + code")
    return problems


def _check_cs(cs: Any, path: str) -> list[str]:
    if cs is None:
        return [f"{path}: missing"]
    if not isinstance(cs, dict):
        return [f"{path}: not an object"]
    problems = []
    axes = cs.get("axis")
    if not isinstance(axes, list) or not axes:
        return [f"{path}: missing axis list"]
    for i, ax in enumerate(axes):
        if not isinstance(ax, dict):
            problems.append(f"{path}.axis[{i}]: not an object")
            continue
        for key in ("name", "abbreviation", "direction"):
            if key not in ax:
                problems.append(f"{path}.axis[{i}]: missing {key}")
        if ax.get("direction") not in _AXIS_DIRECTIONS:
            problems.append(
                f"{path}.axis[{i}]: illegal direction {ax.get('direction')!r}"
            )
        unit = ax.get("unit")
        if isinstance(unit, dict):
            if "name" not in unit or "conversion_factor" not in unit:
                problems.append(f"{path}.axis[{i}].unit: needs name+conversion_factor")
        elif not isinstance(unit, str):
            problems.append(f"{path}.axis[{i}]: missing unit")
    return problems
