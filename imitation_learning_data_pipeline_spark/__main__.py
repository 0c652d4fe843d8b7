"""`python -m imitation_learning_data_pipeline_spark` → the five-stage CLI."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
