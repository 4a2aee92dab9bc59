"""Full-sweep entry script (parity with the reference's ``train.py``):
runs the whole hyperparameter grid into ``tr_results/`` with CSV resume.

Usage: ``python train_entry.py [data_folder]``
"""
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from snnimageclassification_tpu.train.sweep import train_all_params

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    data_folder = sys.argv[1] if len(sys.argv) > 1 else "tr_results"
    df = train_all_params(data_folder=data_folder, verbose=True)
    print(df)
