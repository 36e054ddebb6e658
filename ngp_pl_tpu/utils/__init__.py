from ngp_pl_tpu.utils.mesh import extract_mesh, save_mesh_obj, save_mesh_ply  # noqa: F401
