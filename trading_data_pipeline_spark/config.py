"""Config-driven schema binding: YAML → dataclasses.

Reference: xetra/transformers/xetra_transformer.py:13-66 defines
``XetraSourceConfig`` / ``XetraTargetConfig`` NamedTuples whose fields are
injected from YAML (run.py:26,40-42; configs/xetra_report1_config.yaml:11-34).
Column names are never hardcoded in the transform — they flow from config.
We keep that contract: the report1 transform reads every column name from
these dataclasses, including the date-filter column (fixing the reference's
hardcoded ``.Date`` attribute leak at xetra_transformer.py:204 — noted
divergence, config-correct here).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any

try:  # yaml is optional — configs can also be built directly in Python
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


@dataclass(frozen=True)
class SourceConfig:
    """Source-side binding (ref xetra_transformer.py:13-39)."""

    src_first_extract_date: str = "2021-04-15"
    src_columns: list[str] = field(
        default_factory=lambda: [
            "ISIN", "Mnemonic", "Date", "Time",
            "StartPrice", "EndPrice", "MinPrice", "MaxPrice", "TradedVolume",
        ]
    )
    src_col_date: str = "Date"
    src_col_isin: str = "ISIN"
    src_col_time: str = "Time"
    src_col_start_price: str = "StartPrice"
    src_col_min_price: str = "MinPrice"
    src_col_max_price: str = "MaxPrice"
    src_col_traded_vol: str = "TradedVolume"


@dataclass(frozen=True)
class TargetConfig:
    """Target-side binding (ref xetra_transformer.py:41-66)."""

    trg_col_isin: str = "ISIN"
    trg_col_date: str = "Date"
    trg_col_op_price: str = "opening_price_eur"
    trg_col_clos_price: str = "closing_price_eur"
    trg_col_min_price: str = "minimum_price_eur"
    trg_col_max_price: str = "maximum_price_eur"
    trg_col_dail_trad_vol: str = "daily_traded_volume"
    trg_col_ch_prev_clos: str = "change_prev_closing_%"
    trg_key: str = "report1/xetra_daily_report1_"
    trg_key_date_format: str = "%Y%m%d_%H%M%S"
    trg_format: str = "parquet"


def _from_mapping(cls: type, mapping: dict[str, Any]):
    names = {f.name for f in fields(cls)}
    return cls(**{k: v for k, v in mapping.items() if k in names})


def load_configs(path: str) -> tuple[SourceConfig, TargetConfig, dict[str, Any]]:
    """Parse a reference-style YAML job config (run.py:26,40-42).

    Returns (source, target, full_config_dict); unknown keys are preserved
    in the dict for orchestration (s3 bucket names, meta key, logging).
    """
    if yaml is None:  # pragma: no cover
        raise ImportError("pyyaml is required for YAML config loading")
    with open(path, encoding="utf-8") as fh:
        cfg = yaml.safe_load(fh)
    src = _from_mapping(SourceConfig, cfg.get("source", {}))
    trg = _from_mapping(TargetConfig, cfg.get("target", {}))
    return src, trg, cfg
