"""YAML mode-profile -> pyspark Column-expression compiler.

Re-realizes the reference's only query compiler — the generated plpgsql
``calculate_index`` function — as a pure Column-expression tree:

- mapping parser:  ``core/index_step.py:84-170``
  (``_build_sql_indicator_mapping_internal_``): discrete ``mapping`` and
  threshold ``classes`` kinds, string/numeric list keys ``"{a, b}"``, NULL
  key, ``_default_``, nested mappings (recursion), class ops
  g/ge/l/le/e/ne -> >,>=,<,<=,=,<>.
- overrides:       ``core/index_step.py:43-82`` — temp value from a mapping
  with forced default ``-1``; if ``NOT temp < 0`` either force the index and
  return (``output.type: index``) or replace indicator weights
  (``output.type: weight, for: [...]``).  Overrides run BEFORE the weight
  sums (``calculate_index.sql.j2:56-57``).
- scoring formula: ``calculate_index.sql.j2:59-108`` —
  ``weights_total = sum(non-NULL profile weights)`` (post-override),
  ``weights_sum = sum(weights whose indicator value is non-NULL)``,
  ``index = sum_i score_i * (w_i / weights_sum)`` when ``weights_sum > 0``,
  ``round(index, 4)``; ``robustness = round(weights_sum/weights_total, 4)``.
  An unmapped non-NULL indicator value yields a NULL score which poisons the
  whole index (plpgsql ``index + NULL = NULL``) — reproduced via ``+`` NULL
  propagation.
- explanation:     ``calculate_index.sql.j2:109-119`` — JSON object of
  per-indicator contributions ordered by weight desc, indicator asc.
- access filter + direction: ``sql/templates/index.sql.j2:42-106`` — the
  function is applied twice (_ft/_tf column sets); edges not accessible for
  the profile's modes get NULL outputs via the final left join.

Everything compiles to native Catalyst expressions — no UDF, whole-stage
codegen end to end (the reference pays interpreted plpgsql per row here).
"""

from __future__ import annotations

import copy
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import yaml

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The 17 indicators, in the reference's positional order
# (calculate_index.sql.j2:26-43).
INDICATORS = [
    "bicycle_infrastructure", "pedestrian_infrastructure", "designated_route",
    "road_category", "max_speed", "max_speed_greatest", "parking", "pavement",
    "width", "gradient", "number_lanes", "facilities", "crossings",
    "buildings", "greenness", "water", "noise",
]

# Indicators whose attribute column is directional (index.sql.j2:45-61:
# ``b.<name>_ft`` / ``b.<name>_tf``); the rest bind to a single column.
DIRECTIONAL = {
    "bicycle_infrastructure", "pedestrian_infrastructure", "designated_route",
    "max_speed", "parking", "gradient", "number_lanes",
}


# --- config sanitizers (toolbox/helper.py:143-165, ported verbatim) --------

def is_numeric(value: Any) -> bool:
    return type(value) in [int, float]


def get_safe_name(value: str) -> str:
    return re.sub("[^a-zA-Z0-9_]", "", value)


def get_safe_string(value: Any) -> str:
    return re.sub("[^a-zA-Z0-9_.: \\-]", "", str(value))


def str_to_numeric(value: str, throw_error: bool = False):
    v = re.sub("[^0-9.\\-]", "", value)
    if v.find(".") > -1:
        return float(v)
    elif len(v) > 0:
        return int(v)
    if throw_error:
        raise ValueError(f"Unable to convert string '{value}' to numeric.")
    return None


def str_is_numeric_only(value: str) -> bool:
    return bool(re.fullmatch("[ 0-9.\\-]+", value))


_CLASS_OPS = {"g": ">", "ge": ">=", "l": "<", "le": "<=", "e": "=", "ne": "<>"}


def _apply_op(col: Column, op: str, value) -> Column:
    if op == ">":
        return col > value
    if op == ">=":
        return col >= value
    if op == "<":
        return col < value
    if op == "<=":
        return col <= value
    if op == "=":
        return col == value
    if op == "<>":
        return col != value
    raise ValueError(op)


ColumnResolver = Callable[[str], Column]


def compile_mapping(
    indicator_yml: dict,
    resolve: ColumnResolver,
    force_default_value: bool = False,
    def_value: Any = None,
) -> Column:
    """Port of ``_build_sql_indicator_mapping_internal_`` (index_step.py:84-170).

    Returns the CASE expression as a Column.  First-match-wins order is the
    YAML insertion order, as in the reference.
    """
    spec = copy.deepcopy(indicator_yml)
    indicator_name = get_safe_name(spec.pop("indicator"))
    col = resolve(indicator_name)
    add_default = force_default_value
    default_value: Any = def_value

    keys = list(spec.keys())
    if len(keys) != 1:
        raise ValueError(
            f"Exactly one indicator mapping key is needed for '{indicator_name}'."
        )
    kind = keys[0]
    if kind not in ("mapping", "classes"):
        raise ValueError(f"Unknown indicator mapping '{kind}' for '{indicator_name}'.")
    contents = spec[kind]

    branches: list[tuple[Column, Column]] = []
    for key, v in contents.items():
        if isinstance(v, dict):
            value_col = compile_mapping(v, resolve, force_default_value, def_value)
        elif v is None:
            value_col = F.lit(None).cast("double")
        elif not is_numeric(v):
            raise ValueError(
                f"Only numeric value assignments allowed ('{indicator_name}': '{key}')."
            )
        else:
            value_col = F.lit(float(v))

        if key is None:
            branches.append((col.isNull(), value_col))
        elif str(key) == "_default_":
            add_default = True
            default_value = value_col
        elif str(key).startswith("{") and str(key).endswith("}"):
            slist = str(key)[1:-1].split(",")
            non_numeric = sum(1 for val in slist if not str_is_numeric_only(val))
            if non_numeric > 0:
                values = [get_safe_string(x.strip()) for x in slist]
                branches.append((col.isin(values), value_col))
            else:
                values = [str_to_numeric(x.strip()) for x in slist]
                branches.append((col.isin(values), value_col))
        elif kind == "mapping":
            if is_numeric(key) or type(key) is bool:
                branches.append((col == F.lit(key), value_col))
            else:
                branches.append((col == get_safe_string(key), value_col))
        elif kind == "classes":
            kstr = str(key)
            cv = str_to_numeric(kstr)
            if cv is None:
                raise ValueError(
                    f"Numeric class value required ('{indicator_name}', key '{key}')."
                )
            opstr = re.sub("[^a-zA-Z]", "", kstr)
            op = _CLASS_OPS.get(opstr, "=")
            branches.append((_apply_op(col, op, cv), value_col))
        else:
            raise ValueError(f"Unexpected key '{key}' for '{indicator_name}'.")

    expr: Column | None = None
    for cond, value_col in branches:
        expr = F.when(cond, value_col) if expr is None else expr.when(cond, value_col)
    default_col = (
        default_value
        if isinstance(default_value, Column)
        else (
            F.lit(None).cast("double")
            if default_value is None
            else F.lit(float(default_value))
        )
    )
    if expr is None:  # mapping with only _default_
        return default_col if add_default else F.lit(None).cast("double")
    return expr.otherwise(default_col) if add_default else expr.otherwise(
        F.lit(None).cast("double")
    )


@dataclass
class Profile:
    """A parsed mode profile (examples/profile_bike.yml / profile_walk.yml)."""

    name: str
    weights: dict[str, float | None]
    overrides: list[dict] = field(default_factory=list)
    indicator_mapping: list[dict] = field(default_factory=list)
    # mode-access filter flags (core/index_step.py:30-35: all-true default)
    access_car: bool = True
    access_bike: bool = True
    access_walk: bool = True

    @classmethod
    def from_yaml(cls, path: str, name: str, **access_flags) -> "Profile":
        with open(path) as fh:
            raw = yaml.safe_load(fh)
        weights = {k: (None if v is None else float(v)) for k, v in raw["weights"].items()}
        flags = {}
        if access_flags:
            car = bool(access_flags.get("filter_access_car"))
            bike = bool(access_flags.get("filter_access_bike"))
            walk = bool(access_flags.get("filter_access_walk"))
            if car or bike or walk:
                flags = {"access_car": car, "access_bike": bike, "access_walk": walk}
        return cls(
            name=name,
            weights=weights,
            overrides=raw.get("overrides") or [],
            indicator_mapping=raw.get("indicator_mapping") or [],
            **flags,
        )


def _parse_override(override_yml: dict) -> tuple[list[str], dict]:
    """Port of ``_build_sql_overrides`` header parsing (index_step.py:43-71)."""
    o = copy.deepcopy(override_yml)
    indicator_name = get_safe_name(o.get("indicator"))
    out = o.get("output")
    if out is None or "type" not in out:
        raise ValueError(f"overrides for '{indicator_name}' need output.type")
    out_type = out["type"]
    targets: list[str] = []
    if out_type == "index":
        targets = ["index"]
    elif out_type == "weight":
        ft = out.get("for")
        if isinstance(ft, str):
            targets = [get_safe_name(ft)]
        elif isinstance(ft, list):
            targets = [get_safe_name(t) for t in ft]
    else:
        raise ValueError(f"Unknown override output type '{out_type}'.")
    o.pop("output", None)
    o.pop("description", None)
    return targets, o


def calculate_index(
    profile: Profile,
    value_of: ColumnResolver,
    compute_explanation: bool = False,
) -> dict[str, Column]:
    """Compile one direction's index computation to Columns.

    ``value_of(name)`` resolves an indicator name to its (direction-bound)
    attribute Column.  Returns ``{"index", "index_robustness"[,
    "index_explanation"]}``.
    """
    # 1. initial per-indicator weights (profile constants)
    weight: dict[str, Column] = {
        i: (
            F.lit(float(profile.weights[i]))
            if profile.weights.get(i) is not None
            else F.lit(None).cast("double")
        )
        for i in INDICATORS
    }

    # 2. overrides, in order (calculate_index.sql.j2:57 — before weight sums)
    index_override_val: Column | None = None
    index_override_fired: Column = F.lit(False)
    for ov in profile.overrides:
        targets, mapping_yml = _parse_override(ov)
        temp = compile_mapping(
            mapping_yml, value_of, force_default_value=True, def_value=-1
        )
        fired = F.coalesce(temp >= 0, F.lit(False))
        if targets == ["index"]:
            # first index-override to fire wins; later overrides are dead
            # code for those rows (plpgsql RETURN).
            newly = fired & ~index_override_fired
            index_override_val = (
                F.when(newly, temp)
                if index_override_val is None
                else F.when(index_override_fired, index_override_val).when(newly, temp)
            )
            index_override_fired = index_override_fired | fired
        else:
            # weight overrides only execute where no earlier index override
            # returned.
            effective = fired & ~index_override_fired
            for t in targets:
                weight[t] = F.when(effective, temp).otherwise(weight[t])

    # 3. weight sums (calculate_index.sql.j2:59-97), post-override
    weights_total = sum(
        (F.coalesce(weight[i], F.lit(0.0)) for i in INDICATORS), F.lit(0.0)
    )
    weights_sum = sum(
        (
            F.when(
                value_of(i).isNotNull() & weight[i].isNotNull(), weight[i]
            ).otherwise(F.lit(0.0))
            for i in INDICATORS
        ),
        F.lit(0.0),
    )

    # 4. per-indicator scored contributions (index_step.py:172-184)
    contributions: list[tuple[str, Column, Column]] = []
    index_expr: Column = F.lit(0.0)
    for entry in profile.indicator_mapping:
        iname = get_safe_name(entry["indicator"])
        score = compile_mapping(entry, value_of)
        included = value_of(iname).isNotNull() & weight[iname].isNotNull()
        contribution = score * (weight[iname] / weights_sum)
        # NULL score poisons the sum (plpgsql NULL propagation) — `+` keeps it
        index_expr = index_expr + F.when(included, contribution).otherwise(F.lit(0.0))
        contributions.append((iname, included, contribution))

    index_final = F.when(weights_sum > 0, F.round(index_expr, 4)).otherwise(
        F.lit(None).cast("double")
    )
    robustness = F.round(weights_sum / weights_total, 4)

    if index_override_val is not None:
        index_final = F.when(index_override_fired, index_override_val).otherwise(
            index_final
        )
        robustness = F.when(
            index_override_fired, F.lit(None).cast("double")
        ).otherwise(robustness)

    out = {"index": index_final, "index_robustness": robustness}

    if compute_explanation:
        # sort key: calculate_index.sql.j2:113 is `ORDER BY weight DESC,
        # indicator` — Postgres DESC defaults to NULLS FIRST, so entries
        # whose contribution is NULL (score CASE fell through with no
        # default) lead the JSON object; coalescing the negated key to -inf
        # reproduces that exactly (ties then break on indicator ASC via the
        # struct's field order).
        entries = F.array(
            *[
                F.when(
                    included,
                    F.struct(
                        F.coalesce(-contribution, F.lit(float("-inf"))).alias("sort_w"),
                        F.lit(iname).alias("indicator"),
                        F.round(contribution, 4).alias("weight"),
                    ),
                )
                for iname, included, contribution in contributions
            ]
        )
        sorted_entries = F.array_sort(F.filter(entries, lambda e: e.isNotNull()))
        explanation = F.to_json(
            F.map_from_entries(
                F.transform(
                    sorted_entries,
                    lambda e: F.struct(
                        e["indicator"].alias("key"), e["weight"].alias("value")
                    ),
                )
            )
        )
        explanation = F.when(weights_sum > 0, explanation).otherwise(
            F.lit(None).cast("string")
        )
        if index_override_val is not None:
            explanation = F.when(
                index_override_fired, F.lit(None).cast("string")
            ).otherwise(explanation)
        out["index_explanation"] = explanation

    return out


def direction_resolver(direction: str) -> ColumnResolver:
    """Bind indicator names to attribute columns for one direction
    (index.sql.j2:45-61)."""

    def resolve(name: str) -> Column:
        if name in DIRECTIONAL:
            return F.col(f"{name}_{direction}")
        return F.col(name)

    return resolve


def access_condition(profile: Profile) -> Column:
    """index.sql.j2:82-92 — ``false OR <mode accesses>`` filter."""
    cond = F.lit(False)
    if profile.access_car:
        cond = cond | F.col("access_car_ft") | F.col("access_car_tf")
    if profile.access_bike:
        cond = cond | F.col("access_bicycle_ft") | F.col("access_bicycle_tf")
    if profile.access_walk:
        cond = cond | F.col("access_pedestrian_ft") | F.col("access_pedestrian_tf")
    return F.coalesce(cond, F.lit(False))


def attach_index(
    attrs: DataFrame, profile: Profile, compute_explanation: bool = False
) -> DataFrame:
    """Adds ``index_<p>_ft/tf`` (+ ``_robustness``, ``_explanation``) columns.

    Semantically equal to the LATERAL-apply + LEFT JOIN of index.sql.j2:
    non-accessible edges get NULLs — but as a single projection, no join.
    """
    accessible = access_condition(profile)
    cols = dict()
    for d in ("ft", "tf"):
        res = calculate_index(profile, direction_resolver(d), compute_explanation)
        cols[f"index_{profile.name}_{d}"] = res["index"]
        cols[f"index_{profile.name}_{d}_robustness"] = res["index_robustness"]
        if compute_explanation:
            cols[f"index_{profile.name}_{d}_explanation"] = res["index_explanation"]
    # one withColumns call — a withColumn chain re-analyzes the (large)
    # scoring plan once per column
    return attrs.withColumns(
        {name: F.when(accessible, col) for name, col in cols.items()}
    )
