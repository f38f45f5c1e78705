"""Prepare DIV2K train/valid patch sets (counterpart of reference scripts/run.py)."""

import os

os.system("python ./prepare_dataset.py --images_dir ../data/DIV2K/original/train "
          "--output_dir ../data/DIV2K/Real_ESRGAN/train --image_size 400 --step 200")
os.system("python ./prepare_dataset.py --images_dir ../data/DIV2K/original/valid "
          "--output_dir ../data/DIV2K/Real_ESRGAN/valid --image_size 400 --step 400")
