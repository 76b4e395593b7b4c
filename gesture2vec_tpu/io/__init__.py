from gesture2vec_tpu.io.bvh import BVHData, parse_bvh, write_bvh  # noqa: F401
