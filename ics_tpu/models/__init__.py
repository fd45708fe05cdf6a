"""Solvers ("model families"): TV-MM, TV-PAM, TV-PD deconvolution + the
deblur pipeline."""
