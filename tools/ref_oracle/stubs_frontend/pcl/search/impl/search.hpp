// empty shim
