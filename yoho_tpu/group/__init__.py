from yoho_tpu.group.icosahedral import IcosahedralGroup, get_group  # noqa: F401
