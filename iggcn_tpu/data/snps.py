"""Standalone SNP csv dataset for the SNP-only trainers.

Parity: `SnpsDataset` (`/root/reference/snps_graph.py:295-331`) — reads
`<root>/<cohort-folder>/snp.csv` + `dia.csv` (pandas-style, first row is a
header), scales the SNP matrix by /10, labels kept as float for BCE. The
disease-id -> folder mapping is the reference's: 0 -> data_AH (AD vs HC),
1 -> data_MH (MCI vs HC), else data_AM (AD vs MCI). Splitting is the
trainers' job (`train/snps_trainer.py` k_fold), so this returns the full
arrays (the reference's `isAllData=True` view).
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

DISEASE_FOLDER = {0: "data_AH", 1: "data_MH"}


def load_snps_csv(root: str, disease_id: int = 0
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Load (snps, labels) from `<root>/<folder>/{snp,dia}.csv`.

    Returns:
      snps: (S, num_snps) float32, values / 10 (reference scaling).
      labels: (S,) float32 binary diagnosis.
    """
    folder = DISEASE_FOLDER.get(disease_id, "data_AM")
    base = os.path.join(root, folder)
    snp_path = os.path.join(base, "snp.csv")
    dia_path = os.path.join(base, "dia.csv")
    if not (os.path.exists(snp_path) and os.path.exists(dia_path)):
        raise FileNotFoundError(f"no snp.csv/dia.csv under {base}")
    data = np.genfromtxt(snp_path, delimiter=",", skip_header=1,
                         dtype=np.float64)
    data = np.atleast_2d(data) / 10.0
    label = np.genfromtxt(dia_path, delimiter=",", skip_header=1,
                          dtype=np.float64)
    label = np.asarray(label).reshape(-1)
    if data.shape[0] != label.shape[0]:
        raise ValueError(f"snp.csv has {data.shape[0]} rows but dia.csv "
                         f"has {label.shape[0]}")
    return data.astype(np.float32), label.astype(np.float32)
