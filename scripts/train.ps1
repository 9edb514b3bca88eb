# A-domain training preset (reference train.sh parity; TPU needs no GPU pinning)
python3 -m image_denoising_tpu.cli.train --log_name UNetImproved
