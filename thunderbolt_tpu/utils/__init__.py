from thunderbolt_tpu.utils.smallmat import det_small, inv_small
