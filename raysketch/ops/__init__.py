"""Large-scale data-pipeline operators built on the engine."""
