"""L5 model layer: spectral simulation, custom block metrics, classifier
training, and artifact persistence."""
