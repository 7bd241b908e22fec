"""Entry-point shim: ``python train.py --model-type ...`` exactly like the
reference (``/root/reference/train.py``), backed by kanvit's TPU-native
trainer."""

from kanvit.cli import main

if __name__ == "__main__":
    main()
