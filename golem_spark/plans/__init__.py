"""Logical-plan layer: the fit control (the engine's IR) and plan
inspection helpers."""

from golem_spark.plans.control import FitControl
from golem_spark.plans.inspect import executed_plan, plan_properties

__all__ = ["FitControl", "executed_plan", "plan_properties"]
