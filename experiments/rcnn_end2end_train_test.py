"""End-to-end train + test (reference experiments/relation_rcnn/
rcnn_end2end_train_test.py surface): trains with train.py, then evaluates the
FINAL TRAINED EPOCH with test.py — the reference's train->test handoff loads
the last epoch's params (relation_rcnn/train_end2end.py:151-152 checkpoints,
relation_rcnn/test.py:67 loads cfg.TEST.test_epoch)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))


def final_params_path(cfg_path: str) -> str:
    """Where train.py saved the last epoch's params-only checkpoint."""
    from relation_tpu.config.defaults import load_config
    cfg = load_config(cfg_path)
    cfg_name = os.path.splitext(os.path.basename(cfg_path))[0]
    out_path = os.path.join(cfg.output_path or "output", cfg_name,
                            cfg.dataset.image_set)
    prefix = os.path.join(out_path, cfg.TRAIN.model_prefix or "model")
    return f"{prefix}-{int(cfg.TRAIN.end_epoch):04d}.params.msgpack"


if __name__ == "__main__":
    args = sys.argv[1:]
    subprocess.run([sys.executable, os.path.join(HERE, "train.py")] + args,
                   check=True)
    if "--ckpt" not in args:
        cfg_path = args[args.index("--cfg") + 1]
        ckpt = final_params_path(cfg_path)
        if not os.path.exists(ckpt):
            # train.py was step-capped short of end_epoch (--steps); use the
            # newest params file it did write
            d = os.path.dirname(ckpt)
            cands = sorted(f for f in os.listdir(d)
                           if f.endswith(".params.msgpack"))
            if not cands:
                raise FileNotFoundError(f"no trained params under {d}")
            ckpt = os.path.join(d, cands[-1])
        args = args + ["--ckpt", ckpt]
    subprocess.run([sys.executable, os.path.join(HERE, "test.py")] + args,
                   check=True)
