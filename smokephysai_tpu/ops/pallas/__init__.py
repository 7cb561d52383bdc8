from . import jacobi, stencil
