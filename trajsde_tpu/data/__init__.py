from trajsde_tpu.data.scene import SceneBatch  # noqa: F401
