from .plan import LayerPlan, QuantPlan, bake_plan, folded_weight_bias
