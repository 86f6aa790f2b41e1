from .checks import explain_str, assert_no_python_row_udf, plan_report

__all__ = ["explain_str", "assert_no_python_row_udf", "plan_report"]
