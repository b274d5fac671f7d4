from .mesh import (make_mesh, param_shardings, data_shardings, place,
                   make_sharded_value_and_grad, fit_sharded)

__all__ = ["make_mesh", "param_shardings", "data_shardings", "place",
           "make_sharded_value_and_grad", "fit_sharded"]
