"""COSMIC v3.3.1 SBS reference signatures (bundled data asset).

Parity: get_cosmic / download_cosmic / get_cosmic_colors
(/root/reference/R/helpers.R:166-206). The CSV is the public COSMIC v3.3.1
GRCh37 SBS matrix (96 trinucleotide mutation types x 79 signatures), vendored
under bayesnmf_tpu/data/.
"""

from __future__ import annotations

import os

import pandas as pd

_DATA_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "data")
COSMIC_CSV = os.path.abspath(
    os.path.join(_DATA_DIR, "COSMIC_v3.3.1_SBS_GRCh37.csv"))
COSMIC_URL = (
    "https://cog.sanger.ac.uk/cosmic-signatures-production/documents/"
    "COSMIC_v3.3.1_SBS_GRCh37.txt")


def get_cosmic() -> pd.DataFrame:
    """Bundled COSMIC v3.3.1 SBS GRCh37 signature matrix (96 x 79)."""
    return pd.read_csv(COSMIC_CSV, index_col=0)


def download_cosmic() -> pd.DataFrame:
    """Fetch the same matrix from sanger.ac.uk (needs network egress)."""
    df = pd.read_csv(COSMIC_URL, sep="\t")
    df = df.set_index("Type")
    return df


def get_cosmic_colors() -> dict:
    """The 6 substitution-class colors used in COSMIC signature plots."""
    return {
        "C>A": (8 / 255, 181 / 255, 236 / 255),
        "C>G": (0.0, 0.0, 0.0),
        "C>T": (225 / 255, 37 / 255, 33 / 255),
        "T>A": (198 / 255, 193 / 255, 195 / 255),
        "T>C": (153 / 255, 200 / 255, 87 / 255),
        "T>G": (233 / 255, 190 / 255, 189 / 255),
    }
