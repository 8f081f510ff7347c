"""Command-line entry points.

Usage (module form; console scripts are installed by pyproject.toml):
  python -m glamr_tpu.cli.run_demo     --cfg glamr_static --video_path v.mp4
  python -m glamr_tpu.cli.run_dataset  --dataset 3dpw --cfg glamr_3dpw
  python -m glamr_tpu.cli.eval_dataset --dataset 3dpw --cfg glamr_3dpw
  python -m glamr_tpu.cli.train        --model motion_infiller --cfg motion_infiller_demo
  python -m glamr_tpu.cli.vis_motion_infiller --cfg motion_infiller_demo

Mirrors the reference CLI surface (global_recon/run_demo.py,
run_dataset.py, eval_dataset.py; motion_infiller/train.py, vis_*;
traj_pred/train.py, vis_traj_pred.py).
"""
