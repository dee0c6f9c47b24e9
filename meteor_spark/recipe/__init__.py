from meteor_spark.recipe.loader import (
    LATEST_VERSION,
    PluginRecipe,
    Recipe,
    RecipeError,
    load_recipe,
    load_recipes,
    vars_from_env,
)

__all__ = [
    "Recipe",
    "PluginRecipe",
    "RecipeError",
    "load_recipe",
    "load_recipes",
    "vars_from_env",
    "LATEST_VERSION",
]
