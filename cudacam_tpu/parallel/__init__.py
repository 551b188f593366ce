from cudacam_tpu.parallel.mesh import make_mesh
from cudacam_tpu.parallel.sharded import build_sharded_pipeline

__all__ = ["make_mesh", "build_sharded_pipeline"]
