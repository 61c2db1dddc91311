from cdc_system_spark.plans.audit import audit_plan, explain_str, plan_features

__all__ = ["audit_plan", "explain_str", "plan_features"]
