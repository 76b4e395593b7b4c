from gesture2vec_tpu.mocap import rotations  # noqa: F401
