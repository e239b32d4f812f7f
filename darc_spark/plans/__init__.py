from darc_spark.plans.inspect import (  # noqa: F401
    assert_broadcast_join,
    assert_no_python,
    assert_pushed_filters,
    executed_plan,
    python_eval_count,
)
