"""Test-only entry (reference experiments/relation_rcnn/rcnn_test.py surface)."""
import os
import runpy
import sys

sys.argv[0] = os.path.join(os.path.dirname(os.path.abspath(__file__)), "test.py")
runpy.run_path(sys.argv[0], run_name="__main__")
