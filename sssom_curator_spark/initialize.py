"""Project scaffold (SURVEY.md S10).

The reference scaffolds a curation repository folder: four seeded SSSOM
TSV files under ``data/``, a ``sssom-curator.json`` configuration, and a
README (reference ``initialize_folder``,
/root/reference/src/sssom_curator/initialize/__init__.py:92-258; seed rows
:45-84; filenames constants.py:72-75, repository.py:51). The engine
analogue keeps the same on-disk artifact layout — the four files are the
interop/fixture boundary — while all mapping data flows through the
distributed TSV sink.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sssom_curator_spark.io.sssom_tsv import write_sssom_tsv
from sssom_curator_spark.schema import STATUSES
from sssom_curator_spark.sources.fixtures import PREFIX_MAP, seed_repository

__all__ = ["FILE_NAMES", "initialize_project", "slugify_title", "load_project_config"]

#: status → scaffold filename (reference constants.py:72-75).
FILE_NAMES = {
    "positive": "positive.sssom.tsv",
    "negative": "negative.sssom.tsv",
    "predicted": "predictions.sssom.tsv",
    "unsure": "unsure.sssom.tsv",
}

CONFIGURATION_FILENAME = "sssom-curator.json"
CC0_URL = "https://creativecommons.org/publicdomain/zero/1.0/"


def initialize_project(
    spark: SparkSession,
    directory: str,
    *,
    mapping_set_id: str,
    title: str | None = None,
    purl_base: str | None = None,
    seeds: dict[str, DataFrame] | None = None,
    license: str = CC0_URL,
) -> dict[str, Any]:
    """Scaffold a curation repository folder.

    Creates ``data/{positive,negative,predictions,unsure}.sssom.tsv``
    (seeded with the reference's four example mappings unless ``seeds``
    provides per-status frames), ``sssom-curator.json``, and a README —
    the reference's folder layout. Refuses to overwrite existing files
    (reference :216-218 FileExistsError semantics).

    Returns the configuration dict (also written to disk).
    """
    directory = os.path.abspath(directory)
    if purl_base is None:
        purl_base = mapping_set_id.rsplit("/", 1)[0].rstrip("/") + "/"
    if title is None:
        title = os.path.basename(directory)

    repo = seed_repository(spark)
    frames = seeds or {
        s: repo.filter(F.col("status") == s).drop("status") for s in STATUSES
    }

    data_dir = os.path.join(directory, "data")
    os.makedirs(data_dir, exist_ok=True)
    paths: dict[str, str] = {}
    for status, filename in FILE_NAMES.items():
        path = os.path.join(data_dir, filename)
        if os.path.exists(path):
            raise FileExistsError(f"{path} already exists. cowardly refusing to overwrite.")
        write_sssom_tsv(
            frames[status],
            path,
            prefix_map=PREFIX_MAP,
            metadata={"mapping_set_id": f"{purl_base}{filename}"},
        )
        paths[status] = os.path.join("data", filename)

    config = {
        "positives_path": paths["positive"],
        "negatives_path": paths["negative"],
        "predictions_path": paths["predicted"],
        "unsure_path": paths["unsure"],
        "mapping_set": {
            "id": mapping_set_id,
            "title": title,
            "version": "1",
            "license": license,
        },
        "purl_base": purl_base,
    }
    config_path = os.path.join(directory, CONFIGURATION_FILENAME)
    if os.path.exists(config_path):
        raise FileExistsError(f"{config_path} already exists.")
    with open(config_path, "w", encoding="utf-8") as fh:
        json.dump(config, fh, indent=2)
        fh.write("\n")

    readme = (
        f"# {title}\n\n"
        f"SSSOM curation repository scaffolded by sssom-curator-spark.\n\n"
        f"- mapping set: {mapping_set_id}\n"
        f"- curation files: `data/*.sssom.tsv`\n"
        f"- configuration: `{CONFIGURATION_FILENAME}`\n"
    )
    if license == CC0_URL:
        readme += "\nLicensed CC0 1.0.\n"
    with open(os.path.join(directory, "README.md"), "w", encoding="utf-8") as fh:
        fh.write(readme)
    return config


def slugify_title(title: str) -> str:
    """C10 name normalization for export filenames (reference
    export/merge.py:65: ``title.lower().replace(" ", "-")``)."""
    return title.lower().replace(" ", "-")


def load_project_config(path: str) -> dict[str, Any]:
    """C12 JSON config parse (reference repository.py:105-110,199-210:
    ``Repository.model_validate_json`` over ``sssom-curator.json``).
    Accepts a project directory or a direct config-file path; validates
    the fields the engine consumes."""
    if os.path.isdir(path):
        path = os.path.join(path, CONFIGURATION_FILENAME)
    with open(path, encoding="utf-8") as fh:
        config = json.load(fh)
    required = {"positives_path", "negatives_path", "predictions_path", "unsure_path"}
    missing = required - set(config)
    if missing:
        raise ValueError(f"config {path} missing required keys: {sorted(missing)}")
    return config
