"""User-facing CLI (`wetts-tpu --text ... --wav ...`) and model bundle."""
