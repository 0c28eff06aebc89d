"""kornia_tpu test package (regular package so /root/reference/tests cannot shadow it)."""
