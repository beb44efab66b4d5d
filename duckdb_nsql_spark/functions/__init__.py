from .pyfuncs import register_python_functions

__all__ = ["register_python_functions"]
