"""Low-level TPU ops: windows, PSF utilities, convolution, TV stencils, reductions."""
