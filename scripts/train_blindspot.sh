#!/bin/bash
# Blindspot-UNet A-domain training preset: the reference's `blindspot`
# log_name substring dispatch (train.py:298-302) selects the 4-rotation
# shifted-conv UNet. Structure loss, reference defaults otherwise.
python3 -m image_denoising_tpu.cli.train --log_name UNET_blindspot_gauss25 --n_feature 48
