"""Schema-alias resolution — SURVEY.md §1.3's "small schema-resolution
helper": sources are schema-on-read and the same logical column arrives
under different names per provider (``tm``→``date``, ``stnNm``→
``station_name`` at impute_missing.py:259-277; "발전소명" fallback to
"발전구분" at namdong_merge_pv_data.py:84-89).

Resolution is a pure projection (zero-cost in the plan): for each
canonical name, the first alias present wins and is renamed; a missing
required column raises with the full candidate list, matching the
reference's explicit error paths.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame


def resolve_columns(
    df: DataFrame,
    aliases: Mapping[str, Sequence[str]],
    required: Sequence[str] = (),
) -> DataFrame:
    """Rename the first-present alias of each canonical column.

    ``aliases``: canonical name → candidate names in priority order (the
    canonical name itself is always accepted first). Columns not listed
    pass through untouched. ``required`` canonical names must resolve or
    a ``ValueError`` lists what was searched.
    """
    out = df
    for canonical, candidates in aliases.items():
        chain = [canonical, *candidates]
        present = next((c for c in chain if c in out.columns), None)
        if present is None:
            if canonical in required:
                raise ValueError(
                    f"required column {canonical!r} not found; tried {chain}"
                )
            continue
        if present != canonical:
            out = out.withColumnRenamed(present, canonical)
    return out


# the reference's weather-source alias sets (impute_missing.py:259-277)
WEATHER_ALIASES: dict[str, tuple[str, ...]] = {
    "tm": ("date", "datetime", "일시"),
    "stnNm": ("station_name", "stn_nm", "지점명"),
}

# PV CSV alias sets (namdong_merge_pv_data.py:84-89)
PV_ALIASES: dict[str, tuple[str, ...]] = {
    "발전소명": ("발전구분", "plant_name"),
}
