"""Layered configuration: base <- environment overlay <- CLI dotlist.

Mirrors the reference's OmegaConf precedence chain (reference
``main.py:42-77``: base config, then ``config_{env}.yaml``, then CLI
``key=value`` dotlist) without requiring OmegaConf: plain-dict deep merge
plus dotted-path overrides. YAML files are supported when PyYAML is
importable; JSON always works; in-process dict configs need no files.
"""

from __future__ import annotations

import copy
import json
from pathlib import Path
from typing import Any, Mapping

try:  # pragma: no cover - environment-dependent
    import yaml  # type: ignore

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False


DEFAULT_CONFIG: dict[str, Any] = {
    "environment": "develop",
    "paths": {
        "input_file": None,
        "output_base": None,
    },
    "filters": {
        # Lexicographic string-range filter on yyyyMMdd — parity with the
        # reference (SURVEY §2.2 P5): do NOT convert to dates.
        "start_date": "20250101",
        "end_date": "20250630",
        "country": None,
    },
    "spark": {
        "app_name": "etl_entregas_pyspark_spark",
        "master": "local[*]",
        "log_level": "WARN",
        "configs": {
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.session.timeZone": "UTC",
        },
    },
    "business_rules": {
        "units_conversion": {"CS": 20, "ST": 1},
        "delivery_types": {
            "routine": ["ZPRE", "ZVE1"],
            "bonus": ["Z04", "Z05"],
        },
    },
    "data_quality": {
        "remove_null_material": True,
        "remove_zero_price": False,
        "remove_duplicates": True,
        "validate_country_codes": True,
        "valid_countries": ["GT", "SV", "HN", "EC", "PE", "JM"],
    },
    "output_schema": {
        "column_mapping": {
            "pais": "codigo_pais",
            "fecha_proceso": "fecha_proceso",
            "transporte": "id_transporte",
            "ruta": "id_ruta",
            "tipo_entrega": "codigo_tipo_entrega",
            "material": "codigo_material",
            "precio": "precio_unitario",
            "cantidad": "cantidad_original",
            "unidad": "unidad_original",
        },
    },
    "country_names": {
        "GT": "Guatemala",
        "SV": "El Salvador",
        "HN": "Honduras",
        "EC": "Ecuador",
        "PE": "Perú",
        "JM": "Jamaica",
    },
}


def deep_merge(base: Mapping[str, Any], overlay: Mapping[str, Any]) -> dict[str, Any]:
    """Recursively merge ``overlay`` onto ``base`` (overlay wins; dicts merge,
    everything else replaces). Neither input is mutated."""
    out: dict[str, Any] = copy.deepcopy(dict(base))
    for key, value in overlay.items():
        if key in out and isinstance(out[key], Mapping) and isinstance(value, Mapping):
            out[key] = deep_merge(out[key], value)
        else:
            out[key] = copy.deepcopy(value)
    return out


def _coerce(value: str) -> Any:
    """Best-effort scalar coercion for CLI dotlist values."""
    lowered = value.lower()
    if lowered in {"null", "none", "~"}:
        return None
    if lowered == "true":
        return True
    if lowered == "false":
        return False
    for caster in (int, float):
        try:
            return caster(value)
        except ValueError:
            continue
    return value


def apply_dotlist(config: Mapping[str, Any], dotlist: list[str]) -> dict[str, Any]:
    """Apply ``a.b.c=value`` overrides (highest precedence).

    Dotted segments normally descend nested dicts, but if at any level the
    REMAINING dotted path exists as a literal key (the ``spark.configs``
    map stores flat ``spark.sql.*`` keys), it is assigned directly — so
    ``spark.configs.spark.sql.shuffle.partitions=64`` updates the flat key
    instead of growing a nested tree inside the conf map. Inside a known
    flat-key map the remaining path is ALWAYS one flat key, even when it
    does not pre-exist: ``spark.configs.spark.executor.memory=8g`` must
    create the flat conf ``spark.executor.memory``, not a nested dict that
    would later stringify into a garbage conf value.
    """
    out = copy.deepcopy(dict(config))
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"dotlist entry must be key=value, got: {item!r}")
        path, raw = item.split("=", 1)
        keys = path.strip().split(".")
        node = out
        i = 0
        while i < len(keys) - 1:
            remaining = ".".join(keys[i:])
            if isinstance(node, dict) and (
                remaining in node or tuple(keys[:i]) in _FLAT_KEY_MAPS
            ):
                keys = keys[:i] + [remaining]
                break
            node = node.setdefault(keys[i], {})
            if not isinstance(node, dict):
                raise ValueError(f"cannot descend into non-dict at {keys[i]!r} in {path!r}")
            i += 1
        node[keys[-1]] = _coerce(raw)
    return out


# config subtrees whose keys are themselves dotted strings (Spark conf keys):
# dotlist descent stops here and assigns the rest of the path as one key
_FLAT_KEY_MAPS = {("spark", "configs")}


def _load_file(path: Path) -> dict[str, Any]:
    text = path.read_text()
    if path.suffix in {".yaml", ".yml"}:
        if not _HAVE_YAML:
            raise RuntimeError(f"PyYAML unavailable, cannot read {path}")
        return yaml.safe_load(text) or {}
    return json.loads(text)


def load_config(
    base: Mapping[str, Any] | str | Path | None = None,
    env: str | None = None,
    dotlist: list[str] | None = None,
    config_dir: str | Path | None = None,
) -> dict[str, Any]:
    """Resolve the effective config: DEFAULT <- base <- env overlay <- dotlist."""
    cfg = copy.deepcopy(DEFAULT_CONFIG)
    if base is not None:
        overlay = _load_file(Path(base)) if isinstance(base, (str, Path)) else dict(base)
        cfg = deep_merge(cfg, overlay)
    if env:
        directory = Path(config_dir) if config_dir else Path("config")
        for suffix in (".yaml", ".yml", ".json"):
            candidate = directory / f"config_{env}{suffix}"
            if candidate.exists():
                cfg = deep_merge(cfg, _load_file(candidate))
                break
    if dotlist:
        cfg = apply_dotlist(cfg, dotlist)
    return cfg


def validate_date_range(start: str, end: str) -> None:
    """Both yyyyMMdd strings, start <= end lexicographically (reference
    ``main.py:125-148`` semantics: string comparison, fixed width)."""
    for name, value in (("start_date", start), ("end_date", end)):
        if not isinstance(value, str) or len(value) != 8 or not value.isdigit():
            raise ValueError(f"{name} must be an 8-digit yyyyMMdd string, got {value!r}")
    if start > end:
        raise ValueError(f"start_date {start!r} > end_date {end!r}")
