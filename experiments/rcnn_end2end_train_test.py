"""End-to-end train + test (reference experiments/relation_rcnn/
rcnn_end2end_train_test.py surface): trains with train.py, then evaluates."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

if __name__ == "__main__":
    args = sys.argv[1:]
    subprocess.run([sys.executable, os.path.join(HERE, "train.py")] + args,
                   check=True)
    subprocess.run([sys.executable, os.path.join(HERE, "test.py")] + args,
                   check=True)
