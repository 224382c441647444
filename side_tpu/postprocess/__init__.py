from . import box_solver, dense_align, post_process  # noqa: F401
