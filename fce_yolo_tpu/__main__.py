"""`python -m fce_yolo_tpu TASK MODE k=v...` — same grammar as the console script."""

from fce_yolo_tpu.cfg import entrypoint

if __name__ == "__main__":
    entrypoint()
